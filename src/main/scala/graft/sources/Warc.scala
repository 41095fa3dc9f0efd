package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC record with its protocol headers and raw body bytes. */
final case class WarcRec(
    warcFile: String,
    recNo: Long,
    recType: String,
    recordId: String,
    targetUri: String,
    warcDate: String,
    contentType: String,
    contentLength: Long,
    body: Array[Byte])

/** WARC (Web ARChive, ISO 28500) source — the canonical ingest format
  * of a web-scale training pipeline (CommonCrawl ships ~1 GB WARC
  * files; C4/RefinedWeb/FineWeb all start from them).
  *
  * Format (WARC 1.0/1.1): each record is a `WARC/1.x\r\n` version
  * line, name:value headers (`WARC-Type`, `WARC-Target-URI`,
  * `Content-Length`, …), a blank line, `Content-Length` body bytes,
  * and a `\r\n\r\n` trailer. A `.warc.gz` stores EACH record as its
  * own gzip member; the JDK's `GZIPInputStream` reads concatenated
  * members transparently, so one streaming pass covers both layouts
  * (sniffed by the 0x1f8b magic).
  *
  * Scale design: CommonCrawl's own layout IS the parallelism unit —
  * thousands of ~1 GB files; the reader distributes one file per task
  * via `binaryFiles` PortableDataStream (STREAMED record iteration,
  * never the whole file in memory) and parses with a total,
  * stop-on-malformed parser (truncated tails end the file's iteration
  * rather than failing the job — the tool convention of every decoder
  * in this engine). Record-level parallelism inside one file would
  * need gzip-member resync like the pcap `chunkBytes` path; at the
  * standard file sizes file-parallelism saturates any cluster first.
  *
  * [[htmlToText]] is the C4-style extraction step: drop script/style
  * subtrees, strip tags, unescape the core entities, collapse
  * whitespace — a pure codegen'd `regexp_replace`/`replace` chain
  * (RE2-compatible patterns, no backreferences, so the DuckDB oracle
  * replays it verbatim).
  */
object Warc {

  /** Parse one WARC stream (plain or multi-member gzip already
    * unwrapped by the caller) into records; stops at EOF or the first
    * malformed header block. */
  private[sources] def parseStream(in: InputStream, fileName: String): Iterator[WarcRec] =
    new Iterator[WarcRec] {
      private var nextRec: WarcRec = _
      private var recNo = 0L
      private var done = false

      private def readLine(): String = {
        // WARC headers are ASCII lines terminated by \r\n
        val sb = new java.lang.StringBuilder(64)
        var b = in.read()
        if (b < 0) throw new EOFException
        while (b >= 0 && b != '\n') {
          if (b != '\r') sb.append(b.toChar)
          b = in.read()
        }
        sb.toString
      }

      private def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) throw new EOFException
          off += r
        }
        buf
      }

      private def advance(): Unit = {
        nextRec = null
        try {
          // skip inter-record blank lines, find the version line
          var line = readLine()
          while (line.isEmpty) line = readLine()
          if (!line.startsWith("WARC/")) { done = true; return }
          val headers = scala.collection.mutable.Map.empty[String, String]
          line = readLine()
          while (line.nonEmpty) {
            val i = line.indexOf(':')
            if (i < 0) { done = true; return }
            headers(line.substring(0, i).trim.toLowerCase) = line.substring(i + 1).trim
            line = readLine()
          }
          val len = headers.get("content-length").map(_.toLong).getOrElse(-1L)
          if (len < 0 || len > Int.MaxValue) { done = true; return }
          val body = readFully(len.toInt)
          nextRec = WarcRec(fileName, recNo,
            headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-record-id", ""),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-date", ""),
            headers.getOrElse("content-type", ""),
            len, body)
          recNo += 1
        } catch {
          case _: EOFException => done = true
          case _: NumberFormatException => done = true
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRec = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }

  /** Read every record of the matched WARC file(s), one task per file;
    * `.warc.gz` (per-record gzip members) is sniffed by magic. */
  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open())
        raw.mark(2)
        val m0 = raw.read(); val m1 = raw.read()
        raw.reset()
        val in: InputStream =
          if (m0 == 0x1f && m1 == 0x8b) new GZIPInputStream(raw) else raw
        parseStream(in, file)
      }
      .toDF()
  }

  /** The HTTP payload of a response record rendered as UTF-8 text:
    * everything after the first blank line of the embedded HTTP
    * message (the status line + headers prefix). */
  def httpPayload(bodyText: Column): Column = {
    val pos = instr(bodyText, "\r\n\r\n")
    when(pos > 0, bodyText.substr(pos + 4, length(bodyText))).otherwise(bodyText)
  }

  /** C4-style HTML → text: remove script/style subtrees, strip tags,
    * unescape the core entities (&amp; LAST so double-escapes stay
    * inert), collapse whitespace. RE2-compatible — no backreferences —
    * so the oracle replays the identical chain. */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val unesc = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (from, to)) =>
        replace(col0, lit(from), lit(to)) // exact replace — same builtin in the oracle
      }
    trim(regexp_replace(unesc, "\\s+", " "))
  }
}
