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
  * in this engine). For ONE oversized file, [[recordsChunked]] is the
  * ranged-task path: gzip-member (CRC-verified) / record-boundary
  * resync with chunk ownership, the pcap `chunkBytes` discipline.
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
  private[graft] def parseStream(in: InputStream, fileName: String): Iterator[WarcRec] =
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
    * `.warc.gz` (per-record gzip members) is sniffed by magic.
    *
    * Parallelism (WarcScaleSpec receipt): `binaryFiles` sizes combined
    * splits at min(128 MB, max(4 MB open-cost, totalBytes/parallelism))
    * and never splits one file, so real segment files (CommonCrawl's
    * ~1 GB layout) fan out one-file-per-task on any real cluster, and
    * small-file batches pack to ~one split per core. `minPartitions`
    * (default: Spark's own heuristic) is the explicit override for
    * low-parallelism contexts — it feeds the same split-size formula,
    * so e.g. 8 segment files read with >= 8 tasks regardless of core
    * count. For ONE oversized file, [[recordsChunked]] is the
    * ranged-task path. */
  def records(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path,
      if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultMinPartitions)
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

  // ─────────────────────────── chunked read ───────────────────────────

  /** Parse one gzip MEMBER starting at `off` in `buf`: returns the
    * decompressed bytes and the member's total compressed length, or
    * None when `off` does not start a valid member fully contained in
    * `buf` (CRC32 and ISIZE are verified, so resync false positives on
    * random 1f 8b 08 bytes are rejected). */
  private[graft] def gzipMember(buf: Array[Byte], off: Int): Option[(Array[Byte], Int)] = {
    try {
      if (off + 18 > buf.length || (buf(off) & 0xff) != 0x1f
        || (buf(off + 1) & 0xff) != 0x8b || buf(off + 2) != 8) return None
      val flg = buf(off + 3) & 0xff
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > buf.length) return None
        val xlen = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (p < buf.length && buf(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (p < buf.length && buf(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      if (p >= buf.length) return None
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(buf, p, buf.length - p)
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val tmp = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n == 0 && inf.needsInput()) { inf.end(); return None } // truncated
        out.write(tmp, 0, n)
      }
      val consumed = inf.getBytesRead.toInt
      inf.end()
      val tail = p + consumed
      if (tail + 8 > buf.length) return None
      val data = out.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      def le32(i: Int): Long =
        (buf(i) & 0xffL) | ((buf(i + 1) & 0xffL) << 8) |
          ((buf(i + 2) & 0xffL) << 16) | ((buf(i + 3) & 0xffL) << 24)
      if (le32(tail) != crc.getValue || le32(tail + 4) != (data.length & 0xffffffffL)) return None
      Some((data, tail + 8 - off))
    } catch {
      case _: java.util.zip.DataFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Records of the raw byte window `buf` (absolute file offset
    * `bufStart`) whose START offset falls in [bufStart, end): the
    * chunk-ownership rule. `gz` = per-record-gzip-member layout. */
  private[graft] def chunkRecords(buf: Array[Byte], bufStart: Long, end: Long,
      gz: Boolean, fileName: String): Iterator[WarcRec] = {
    val out = Seq.newBuilder[WarcRec]
    var p = 0
    val limit = (end - bufStart).toInt
    def rest(q: Int) = new java.io.ByteArrayInputStream(buf, q, buf.length - q)
    if (gz) {
      // scan: every verified member starting in-range is owned; a
      // random 1f 8b 08 in compressed bytes fails CRC/ISIZE and the
      // scan advances one byte — the deep-chain resync rule
      while (p < limit) {
        gzipMember(buf, p) match {
          case Some((data, clen)) =>
            val decoded = parseStream(new java.io.ByteArrayInputStream(data), fileName).toSeq
            if (decoded.nonEmpty) {
              val base = bufStart + p
              // recNo = member byte offset (+ordinal inside a
              // multi-record member): globally ordered without a
              // serial pre-scan, the chunked-pcap convention
              out ++= decoded.map(r => r.copy(recNo = base + r.recNo))
              p += clen
            } else p += 1
          case None => p += 1
        }
      }
    } else {
      // plain text resync: a "WARC/1" at chunk start or after \n,
      // validated by a full record parse from that point
      if (bufStart != 0) {
        var q = 0
        var found = -1
        while (found < 0 && q < limit) {
          if (buf(q) == 'W' && (q == 0 || buf(q - 1) == '\n')
            && new String(buf, q, math.min(7, buf.length - q), StandardCharsets.US_ASCII)
              .startsWith("WARC/1")
            && parseStream(rest(q), fileName).hasNext)
            found = q
          else q += 1
        }
        if (found < 0) return Iterator.empty
        p = found
      }
      // sequential parse with offset tracking: one record at a time so
      // each record's absolute offset is exact
      var cont = true
      while (cont && p < limit) {
        val it = parseStream(rest(p), fileName)
        if (it.hasNext) {
          val r = it.next()
          val headEnd = indexOfDoubleCrlf(buf, p)
          if (headEnd < 0) cont = false
          else {
            out += r.copy(recNo = bufStart + p)
            var next = headEnd + 4 + r.contentLength.toInt
            // skip the inter-record blank lines
            while (next < buf.length && (buf(next) == '\r' || buf(next) == '\n')) next += 1
            if (next <= p) cont = false else p = next
          }
        } else cont = false
      }
    }
    out.result().iterator
  }

  private def indexOfDoubleCrlf(buf: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < buf.length) {
      if (buf(i) == '\r' && buf(i + 1) == '\n' && buf(i + 2) == '\r' && buf(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Ranged read of huge WARC files — the `chunkBytes` scale path (the
    * pcap `decodeChunk` discipline): the file splits into byte ranges,
    * one task each; a task resyncs to the first VERIFIED record
    * boundary at-or-after its range start (gzip members must pass
    * CRC32+ISIZE and contain parseable WARC; plain text must parse a
    * full record from the candidate) and owns exactly the records that
    * START inside its range, reading up to one extra chunk of overhang
    * for a record that crosses the boundary. Contract: `chunkBytes`
    * must exceed the largest single record (CommonCrawl truncates
    * records at 1 MiB; the 64 KiB floor below is for tests). `recNo`
    * carries the record's absolute BYTE OFFSET — globally ordered and
    * stable without a serial pre-scan, the chunked-pcap frameNo
    * convention. */
  def recordsChunked(spark: SparkSession, path: String, chunkBytes: Long): DataFrame = {
    import spark.implicits._
    require(chunkBytes >= (1L << 16), s"chunkBytes must be >= 64 KiB, got $chunkBytes")
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = org.apache.hadoop.fs.FileSystem.get(hadoopPath.toUri, conf)
    val statuses = Option(fs.globStatus(hadoopPath)).map(_.toSeq)
      .getOrElse(if (fs.exists(hadoopPath)) Seq(fs.getFileStatus(hadoopPath)) else Seq.empty)
    val ranges = statuses.filter(_.isFile).flatMap { st =>
      val len = st.getLen
      val head = new Array[Byte](math.min(2L, len).toInt)
      val in = fs.open(st.getPath)
      try { if (len >= 2) in.readFully(0, head) } finally in.close()
      val gz = len >= 2 && (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b
      (0L until len by chunkBytes).map { start =>
        (st.getPath.toString, start, math.min(start + chunkBytes, len), len, gz)
      }
    }
    spark.sparkContext.parallelize(ranges, math.max(ranges.size, 1))
      .flatMap { case (file, start, end, len, gz) =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fsx = org.apache.hadoop.fs.FileSystem.get(p.toUri,
          new org.apache.hadoop.conf.Configuration())
        // the window: this chunk plus one chunk of overhang for the
        // record that starts before `end` and finishes after it
        val winEnd = math.min(end + (end - start), len)
        val buf = new Array[Byte]((winEnd - start).toInt)
        val in = fsx.open(p)
        try in.readFully(start, buf) finally in.close()
        chunkRecords(buf, start, end, gz, file)
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

  /** Binary-safe HTTP payload split for non-text responses (images,
    * media): the header/payload boundary is located on the ISO-8859-1
    * decoded view — latin-1 maps EVERY byte to exactly one char, so the
    * char index of the first `\r\n\r\n` equals its byte offset for
    * arbitrary body bytes (a UTF-8 view would need the header to be
    * pure ASCII: one obs-text byte — RFC 7230 §3.2.6, seen in real
    * crawls — decodes to a replacement char and silently shifts the
    * slice). The payload is sliced from the ORIGINAL bytes — the body
    * is never round-tripped through a string. */
  def httpPayloadBytes(body: Column): Column = {
    val pos = instr(decode(body, "ISO-8859-1"), "\r\n\r\n")
    when(pos > 0, body.substr(pos + 4, length(body))).otherwise(body)
  }

  /** The HTTP header block (prefix before the first blank line) — for
    * content-type routing of binary responses. Decoded ISO-8859-1 for
    * the same byte-fidelity reason as [[httpPayloadBytes]]: the
    * boundary both functions find is the same byte for any body. */
  def httpHeader(body: Column): Column = {
    val s = decode(body, "ISO-8859-1")
    val pos = instr(s, "\r\n\r\n")
    when(pos > 0, s.substr(lit(1), pos - 1)).otherwise(s)
  }

  /** True when the embedded HTTP header block carries a Content-Type
    * whose value starts with `prefix`. Field names are case-insensitive
    * (RFC 7230 §3.2) and so are media types (RFC 2045 §5.1) — real
    * crawls carry `content-type:` / `Content-type:` freely — so the
    * match lowercases both sides; the `(?m)^` anchor pins the match to
    * a header LINE start, so another header whose value merely contains
    * the text (e.g. a Link or Via header) can never false-positive. */
  def hasContentType(body: Column, prefix: String): Column =
    lower(httpHeader(body)).rlike(
      "(?m)^content-type:[ \\t]*" + java.util.regex.Pattern.quote(prefix.toLowerCase))

  /** CommonCrawl WET companion (`*.warc.wet.gz` — the crawl's
    * PRE-EXTRACTED text distribution, the input most text pipelines
    * actually start from): `conversion` records whose body IS the
    * extracted UTF-8 text — no embedded HTTP message, so there is no
    * payload split. One row per document:
    * (warc_file, rec_no, target_uri, text). Same reader, same
    * layouts (plain / per-record-gzip), same one-task-per-file
    * parallelism as [[records]]. */
  def wetText(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame =
    records(spark, path, minPartitions)
      .filter(col("recType") === "conversion")
      .select(col("warcFile").as("warc_file"), col("recNo").as("rec_no"),
        col("targetUri").as("target_uri"),
        col("body").cast("string").as("text"))

  /** CommonCrawl WAT companion (`*.warc.wat.gz` — per-page METADATA
    * envelopes): `metadata` records whose body is one JSON document
    * (headers, links, server metadata; the schema varies by crawl
    * vintage). Returns the raw JSON string per record — compose with
    * `from_json` / `get_json_object` for the fields a pipeline needs,
    * so malformed vintages degrade per-field rather than killing the
    * scan. */
  def watJson(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame =
    records(spark, path, minPartitions)
      .filter(col("recType") === "metadata")
      .select(col("warcFile").as("warc_file"), col("recNo").as("rec_no"),
        col("targetUri").as("target_uri"),
        col("body").cast("string").as("json"))

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
