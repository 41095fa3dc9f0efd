package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Stateful
import graft.sinks.Sinks

/** Fourth batch of synthesize-input oracle queries — protocol-domain
  * flavors of the correlate/counter/dedup family (round-8 verdict #4:
  * J1/A1/D1 leaned solely on events-based generic analogs, so driver-side
  * testdata churn on ONE table could blank a whole §2 family), plus a
  * driver-checked row for the chunked DSv2 capture read (verdict #5: the
  * round-8 ranged-task resync logic was ScalaTest-only).
  *
  * All inputs are synthesized deterministically from `documents.doc_id`
  * (the Protocol.scala pattern) and run the REAL operators — the same
  * `Stateful.correlate`, `Sinks.withCounters`, and DSv2 pcap reader the
  * pipelines use.
  */
object Protocol4 {

  /** Correlation message for q48/q50 (top-level for kryo-free closure
    * capture; rows are emitted as tuples, so no Encoder is needed). */
  private final case class Msg(frame: Long, isReq: Boolean, own: String,
      filled: String, matched: Boolean)

  private def mergeMsg(req: Msg, res: Msg): (Msg, Msg) =
    (req.copy(filled = res.own, matched = true),
      res.copy(filled = req.own, matched = true))

  // ---------------------------------------------------------------------
  // q48: J1 request↔response correlation through the REAL slot machine
  // (`Stateful.correlate`, ref `diameter.py:302-339,580-589`), protocol
  // flavor of q7_correlate. Four scenarios per doc: matched pair,
  // matched-with-retransmission (D1 drop inside J1), unmatched answer
  // (emitted as-is), unanswered request (K3 EOF flush).
  // ---------------------------------------------------------------------

  val q48CorrelateProto: Q = Q(
    "q48_correlate_proto",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg, CAST(doc_id%4 AS INTEGER) AS m FROM documents)
      |SELECT doc_id, CAST(1 AS BIGINT) AS frame, true AS is_request, 'R'||dg AS own_value,
      |       CASE WHEN m<=1 THEN 'A'||dg ELSE '' END AS filled_value, m<=1 AS matched
      |FROM d WHERE m IN (0,1,3)
      |UNION ALL
      |SELECT doc_id, CAST(m+2 AS BIGINT), false, 'A'||dg, 'R'||dg, true FROM d WHERE m<=1
      |UNION ALL
      |SELECT doc_id, CAST(1 AS BIGINT), false, 'A'||dg, '', false FROM d WHERE m=2
      |ORDER BY doc_id, frame""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val req = Msg(1, isReq = true, "R" + dg, "", matched = false)
        val res = (f: Long) => Msg(f, isReq = false, "A" + dg, "", matched = false)
        val msgs = (id % 4) match {
          case 0 => Seq(req, res(2))
          case 1 => Seq(req, req.copy(frame = 2), res(3)) // frame-2 retrans dropped
          case 2 => Seq(res(1)) // orphan answer
          case _ => Seq(req) // unanswered → EOF flush
        }
        Stateful.correlate[Msg](msgs, _.frame, _.isReq, mergeMsg)
          .map(m => (id, m.frame, m.isReq, m.own, m.filled, m.matched))
      }
      .toDF("doc_id", "frame", "is_request", "own_value", "filled_value", "matched")
      .orderBy("doc_id", "frame")
  }

  // ---------------------------------------------------------------------
  // q50: D1 retransmission dedup emphasized — a VARIABLE number of
  // identical requests (doc_id%3+2 of them) must collapse to the first,
  // and the slot must re-arm after the match (a later request becomes a
  // fresh pending, flushed at EOF). Ref `diameter.py:307-309`.
  // ---------------------------------------------------------------------

  val q50DedupProto: Q = Q(
    "q50_dedup_proto",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg,
      |            CAST(doc_id%3+2 AS INTEGER) AS n FROM documents)
      |SELECT doc_id, CAST(1 AS BIGINT) AS frame, true AS is_request,
      |       'R'||dg AS own_value, 'A'||dg AS filled_value, true AS matched FROM d
      |UNION ALL
      |SELECT doc_id, CAST(n+1 AS BIGINT), false, 'A'||dg, 'R'||dg, true FROM d
      |UNION ALL
      |SELECT doc_id, CAST(n+2 AS BIGINT), true, 'S'||dg, '', false FROM d
      |ORDER BY doc_id, frame""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val n = (id % 3).toInt + 2
        val retrans = (1 to n).map(f =>
          Msg(f.toLong, isReq = true, "R" + dg, "", matched = false))
        val answer = Msg(n + 1L, isReq = false, "A" + dg, "", matched = false)
        val reArmed = Msg(n + 2L, isReq = true, "S" + dg, "", matched = false)
        Stateful.correlate[Msg](retrans :+ answer :+ reArmed, _.frame, _.isReq, mergeMsg)
          .map(m => (id, m.frame, m.isReq, m.own, m.filled, m.matched))
      }
      .toDF("doc_id", "frame", "is_request", "own_value", "filled_value", "matched")
      .orderBy("doc_id", "frame")
  }

  // ---------------------------------------------------------------------
  // q49: A1 processed/not_processed counters through the REAL single-pass
  // `observe()` path (`Sinks.withCounters`, ref `diameter.py:454-487`,
  // `models.py:255-258`) — protocol flavor of q12_counters. The query runs
  // the observed action exactly like the K4 queue-update consumer does and
  // returns the observation as a one-row frame.
  // ---------------------------------------------------------------------

  val q49CountersProto: Q = Q(
    "q49_counters_proto",
    """SELECT CAST(sum(CASE WHEN doc_id%7=0 THEN 0 ELSE 1 END) AS BIGINT) AS processed,
      |  CAST(sum(CASE WHEN doc_id%7=0 THEN 1 ELSE 0 END) AS BIGINT) AS not_processed
      |FROM documents""".stripMargin) { (s, d) =>
    import s.implicits._
    val (observed, obs) = Sinks.withCounters(
      Tables.documents(s, d).select(col("doc_id")),
      isError = col("doc_id") % 7 === 0)
    observed.write.format("noop").mode("overwrite").save() // the K1-shaped action
    val m = obs.get
    Seq((m("processed").asInstanceOf[Long], m("not_processed").asInstanceOf[Long]))
      .toDF("processed", "not_processed")
  }

  // ---------------------------------------------------------------------
  // q51: S2/S3 chunked capture read (round-8 ranged DSv2 tasks with
  // prologue state + trailing-length resync, ref `sigshark.py:141-204`
  // flatten-loop semantics) — a synthesized ~250 KiB classic pcap and
  // ~350 KiB pcapng, each read with chunkBytes=64 KiB so the plan holds
  // ≥3 ranged tasks per file; the require() makes a silently-unchunked
  // read a hard failure rather than a vacuous pass.
  // ---------------------------------------------------------------------

  private val ChunkFrames = 6000

  // Linear, unboxed capture builders: Protocol3's per-doc encoders fold
  // with boxed flatten — fine for the 2-frame captures q39 builds per
  // document, quadratic-with-boxing for one 6000-frame file (measured
  // ~11s/run in the round-9 bench before this).
  private def buildPcap(frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 19)
    def le32(v: Long): Unit = {
      out.write(v.toInt & 0xff); out.write((v >> 8).toInt & 0xff)
      out.write((v >> 16).toInt & 0xff); out.write((v >> 24).toInt & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(Array(0xd4, 0xc3, 0xb2, 0xa1).map(_.toByte)) // LE magic
    le16(2); le16(4); le32(0); le32(0); le32(65535); le32(1) // dlt=1
    frames.foreach { case (i, data) =>
      le32(i); le32(i) // ts_sec = ts_usec = i
      le32(data.length); le32(data.length)
      out.write(data)
    }
    out.toByteArray
  }

  private def buildPcapNg(frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 19)
    def le32(v: Long): Unit = {
      out.write(v.toInt & 0xff); out.write((v >> 8).toInt & 0xff)
      out.write((v >> 16).toInt & 0xff); out.write((v >> 24).toInt & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    // SHB (big-endian block type per spec, LE byte-order magic)
    out.write(Array(0x0a, 0x0d, 0x0d, 0x0a).map(_.toByte)); le32(28)
    le32(0x1a2b3c4dL); le16(1); le16(0); out.write(Array.fill(8)(0xff.toByte)); le32(28)
    le32(1L); le32(20); le16(141); le16(0); le32(65535); le32(20) // IDB dlt=141
    frames.foreach { case (ts, data) =>
      val pad = (4 - data.length % 4) % 4
      val len = 32 + data.length + pad
      le32(6L); le32(len); le32(0)
      le32(ts >>> 32); le32(ts & 0xffffffffL)
      le32(data.length); le32(data.length)
      out.write(data); (0 until pad).foreach(_ => out.write(0))
      le32(len)
    }
    out.toByteArray
  }

  private def writeAtomic(dir: java.nio.file.Path, name: String, bytes: Array[Byte]): String = {
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    val tmp = dir.resolve(name + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    target.toString
  }

  val q51PcapChunked: Q = Q(
    "q51_pcap_chunked",
    s"""SELECT 'le' AS fmt, i AS ts_sec, CAST(i AS INTEGER) AS ts_usec,
      |  CAST(i%37+8 AS INTEGER) AS data_len, CAST(1 AS INTEGER) AS dlt
      |FROM range($ChunkFrames) t(i)
      |UNION ALL
      |SELECT 'ng', 1600000000+i, CAST(i AS INTEGER), CAST(i%37+8 AS INTEGER), CAST(141 AS INTEGER)
      |FROM range($ChunkFrames) t(i)
      |ORDER BY fmt, ts_sec""".stripMargin) { (s, _) =>
    val frames = (0 until ChunkFrames).map { i =>
      (i.toLong, Array.fill((i % 37) + 8)((i * 31).toByte))
    }
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-q51")
    val lePath = writeAtomic(dir, "cap.pcap", buildPcap(frames))
    // 16-digit µs ticks: the decoder's decimal-digit resolution rule
    // (F16/q39) reads shorter tick counts as ms/s resolution
    val ngPath = writeAtomic(dir, "cap.pcapng",
      buildPcapNg(frames.map { case (i, b) =>
        (1600000000000000L + i * 1000000L + i, b)
      }))
    def chunked(path: String, fmt: String) = {
      val df = s.read.format("pcap").option("chunkBytes", (1L << 16).toString).load(path)
      require(df.rdd.getNumPartitions >= 3,
        s"q51: $fmt read planned ${df.rdd.getNumPartitions} tasks — chunking did not engage")
      df.select(lit(fmt).as("fmt"), col("tsSec").as("ts_sec"),
        col("tsUsec").as("ts_usec"), length(col("data")).as("data_len"), col("dlt"))
    }
    chunked(lePath, "le").unionAll(chunked(ngPath, "ng"))
      .orderBy("fmt", "ts_sec")
  }

  // ───────────────────────── q52: WARC ingest ─────────────────────────

  private val WarcPages = 120

  private def warcHtml(i: Int): String =
    s"""<html><head><style>h1 {color: red}</style><script type="text/js">var x = $i; if (x<2) x++;</script></head><body><h1>Title $i</h1>  <p>word$i alpha &amp; beta &lt;tag&gt;</p></body></html>"""

  private def warcRecord(recType: String, uri: String, httpBody: String): Array[Byte] = {
    val body = httpBody.getBytes("UTF-8")
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $recType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recType-$uri>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=$recType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    hdr ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** S-family: WARC ingest — the CommonCrawl front door. Synthesizes a
    * capture of closed-form pages (one response per page; every 5th
    * page also a request record, which the pipeline must skip), stores
    * it BOTH as plain `.warc` and as per-record-gzip-member `.warc.gz`,
    * reads both through [[graft.sources.Warc.records]], splits the HTTP
    * payload and runs the C4-style [[graft.sources.Warc.htmlToText]]
    * chain. The oracle recomputes record numbers, content lengths and
    * the FINAL extracted text purely from the generating formulas (the
    * m2/m3 closed-form discipline — it never parses WARC or HTML), so
    * the hash pins parsing, member-concatenated gunzip, payload split,
    * script/style removal, tag strip, entity unescape and whitespace
    * collapse at once. */
  val q52WarcIngest: Q = Q(
    "q52_warc_ingest",
    s"""WITH r AS (SELECT i FROM range($WarcPages) t(i)),
       |h AS (SELECT i,
       |  '<html><head><style>h1 {color: red}</style><script type="text/js">var x = ' || i ||
       |  '; if (x<2) x++;</script></head><body><h1>Title ' || i ||
       |  '</h1>  <p>word' || i || ' alpha &amp; beta &lt;tag&gt;</p></body></html>' AS html
       |  FROM r),
       |f AS (SELECT 'plain' AS fmt UNION ALL SELECT 'gz')
       |SELECT fmt, CAST(i + i // 5 + 1 AS BIGINT) AS rec_no,
       |       'http://ex.com/page' || i AS target_uri,
       |       CAST(44 + length(html) AS BIGINT) AS content_length,
       |       'Title ' || i || ' word' || i || ' alpha & beta <tag>' AS text
       |FROM h CROSS JOIN f
       |ORDER BY fmt, rec_no""".stripMargin) { (s, _) =>
    val records: Seq[Array[Byte]] = (0 until WarcPages).flatMap { i =>
      val uri = s"http://ex.com/page$i"
      val req =
        if (i % 5 == 0)
          Seq(warcRecord("request", uri, s"GET /page$i HTTP/1.1\r\nHost: ex.com\r\n\r\n"))
        else Seq.empty
      req :+ warcRecord("response", uri,
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n${warcHtml(i)}")
    }
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-q52")
    val plainPath = writeAtomic(dir, "cap.warc", records.reduce(_ ++ _))
    val gzBytes = {
      val out = new java.io.ByteArrayOutputStream(1 << 19)
      records.foreach { r => // one gzip MEMBER per record, the .warc.gz layout
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(r); g.finish()
      }
      out.toByteArray
    }
    val gzPath = writeAtomic(dir, "cap.warc.gz", gzBytes)
    def side(path: String, fmt: String) =
      graft.sources.Warc.records(s, path)
        .filter(col("recType") === "response")
        .select(lit(fmt).as("fmt"), col("recNo").as("rec_no"),
          col("targetUri").as("target_uri"),
          col("contentLength").as("content_length"),
          graft.sources.Warc.htmlToText(
            graft.sources.Warc.httpPayload(col("body").cast("string"))).as("text"))
    side(plainPath, "plain").unionAll(side(gzPath, "gz"))
      .orderBy(col("fmt"), col("rec_no"))
  }

  // ─────────────────── q53: WARC → curation end-to-end ───────────────────

  private val CuratePages = 200

  /** Page text by closed form: duplicated English pairs (the dedup
    * case), a German page (lang-gated), a junk page (quality-gated),
    * and unique English pages (kept). */
  private def curateText(i: Int): String = i % 10 match {
    case 0 | 1 => "the duplicated copy of the page and it is one of a kind in the set"
    case 5 => s"der die das und zu seite nummer $i der die das und zu"
    case 6 => s"word$i x"
    case _ => s"the quick data of the day and it is page $i with the best of words in it"
  }

  /** The full ingest→curate dataflow in ONE query: a synthesized
    * `.warc.gz` (per-record gzip members) → [[graft.sources.Warc]]
    * parse → HTTP payload split → C4 html→text → the t30 curation
    * chain (quality score → language gate → exact dedup keep-min →
    * md5 split). The oracle rebuilds each page's text from the
    * generating formula and replays the t30 SQL chain over it — so one
    * hash pins the whole path from archive bytes to curated training
    * rows. */
  val q53WarcCurate: Q = Q(
    "q53_warc_curate",
    s"""WITH r AS (SELECT i FROM range($CuratePages) t(i)),
       |d0 AS (SELECT CAST(i AS BIGINT) AS doc_id,
       |  CASE
       |    WHEN i % 10 IN (0, 1) THEN 'the duplicated copy of the page and it is one of a kind in the set'
       |    WHEN i % 10 = 5 THEN 'der die das und zu seite nummer ' || i || ' der die das und zu'
       |    WHEN i % 10 = 6 THEN 'word' || i || ' x'
       |    ELSE 'the quick data of the day and it is page ' || i || ' with the best of words in it'
       |  END AS text FROM r),
       |w AS (SELECT doc_id, text, length(text) AS n_chars,
       |       string_split_regex(trim(text), '\\s+') AS w FROM d0),
       |sc AS (SELECT doc_id, text, CAST(len(w) AS BIGINT) AS n_tokens,
       |  0.5 * (len(list_filter(w, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'it'))) / len(w))
       |    + 0.5 * least(1.0, n_chars / 500.0) AS quality_score,
       |  CASE WHEN len(list_filter(w, t -> t IN ('the', 'a', 'and', 'of', 'to')))
       |         >= len(list_filter(w, t -> t IN ('der', 'die', 'das', 'und', 'zu')))
       |        AND len(list_filter(w, t -> t IN ('the', 'a', 'and', 'of', 'to')))
       |         >= len(list_filter(w, t -> t IN ('el', 'la', 'de', 'y', 'que'))) THEN 'en'
       |       WHEN len(list_filter(w, t -> t IN ('der', 'die', 'das', 'und', 'zu')))
       |         >= len(list_filter(w, t -> t IN ('el', 'la', 'de', 'y', 'que'))) THEN 'de'
       |       ELSE 'es' END AS lang
       |  FROM w),
       |kept AS (SELECT * FROM sc WHERE lang = 'en' AND quality_score >= 0.3e0),
       |grp AS (SELECT md5(text) AS h, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies
       |        FROM kept GROUP BY 1),
       |uniq AS (SELECT k.doc_id, k.quality_score, k.n_tokens, g.n_copies
       |         FROM kept k JOIN grp g ON md5(k.text) = g.h AND k.doc_id = g.keeper)
       |SELECT doc_id, quality_score, n_tokens, n_copies,
       |  CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT *, CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bk
       |      FROM uniq)
       |ORDER BY doc_id""".stripMargin) { (s, _) =>
    val gzBytes = {
      val out = new java.io.ByteArrayOutputStream(1 << 19)
      (0 until CuratePages).foreach { i =>
        val html = s"<html><body><p>${curateText(i)}</p></body></html>"
        val rec = warcRecord("response", s"http://ex.com/c$i",
          s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html")
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(rec); g.finish()
      }
      out.toByteArray
    }
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-q53")
    val path = writeAtomic(dir, "curate.warc.gz", gzBytes)
    val docs = graft.sources.Warc.records(s, path)
      .filter(col("recType") === "response")
      .select(col("recNo").as("doc_id"),
        graft.sources.Warc.htmlToText(
          graft.sources.Warc.httpPayload(col("body").cast("string"))).as("text"))
    graft.queries.Text.curateChain(docs).orderBy(col("doc_id"))
  }

  /** A WARC record with a RAW byte body (binary HTTP payloads). */
  private def warcRecordRaw(recType: String, uri: String,
      body: Array[Byte]): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $recType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recType-$uri>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=$recType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    hdr ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** Multimodal ingest→curate end-to-end: the m12 image corpus served
    * THROUGH a WARC capture — each PNG arrives as a binary HTTP image
    * response (plus decoy text/html records that must be routed away
    * by the Content-Type check; their uris would parse as media ids
    * 500+, so a filter failure is a visible hash break, not a silent
    * drop). The pipeline is the crawl shape: WARC parse → HTTP header
    * content-type routing → BINARY payload split
    * ([[graft.sources.Warc.httpPayloadBytes]] — the html→text chain's
    * string path would mangle PNG bytes) → the composed media curation
    * chain (gates → exact dedup → perceptual near-dup). Oracle = m12's
    * closed-form verdicts: the WARC wrap is a pass-through, so any
    * corruption in record framing, payload split or routing breaks the
    * hash. */
  val q54WarcMedia: Q = Q(
    "q54_warc_media",
    Extras.m12OracleSql(96)) { (s, _) =>
    val out = new java.io.ByteArrayOutputStream()
    (0 until 96).foreach { i =>
      val png = Extras.m12Png(i.toLong)
      val http = (s"HTTP/1.1 200 OK\r\n" +
        s"Content-Type: image/png\r\n" +
        s"Content-Length: ${png.length}\r\n\r\n").getBytes("UTF-8") ++ png
      out.write(warcRecordRaw("response",
        s"http://media.example/img$i.png", http))
      if (i % 16 == 0) {
        // decoy: an html response whose uri parses as media id 500+i
        val body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          s"<html><body>img${500 + i}.png is mentioned here</body></html>").getBytes("UTF-8")
        out.write(warcRecordRaw("response",
          s"http://media.example/img${500 + i}.png", body))
      }
    }
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-q54")
    val path = writeAtomic(dir, "media.warc", out.toByteArray)
    val pngs = graft.sources.Warc.records(s, path)
      .filter(col("recType") === "response" &&
        graft.sources.Warc.hasContentType(col("body"), "image/png"))
      .select(
        regexp_extract(col("targetUri"), "img(\\d+)\\.png", 1).cast("long").as("img_id"),
        graft.sources.Warc.httpPayloadBytes(col("body")).as("png"))
    graft.operators.MediaCurate.imageCurate(pngs, "img_id", "png",
      minW = 8, minH = 8, minSpread = 10, maxAspect = 4, maxDist = 3)
      .orderBy(col("media_id"))
  }

  // ─────────────────── q55: WET — pre-extracted text ───────────────────

  private val WetDocs = 60

  /** A WET `conversion` record: the body IS the extracted text — no
    * embedded HTTP message (CommonCrawl's `*.warc.wet.gz` layout). */
  private def wetRecord(uri: String, text: String): Array[Byte] = {
    val body = text.getBytes("UTF-8")
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:uuid:conv-$uri>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    hdr ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def wetDecoy(recType: String, uri: String, ct: String,
      body0: String): Array[Byte] = {
    val body = body0.getBytes("UTF-8")
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $recType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recType-$uri>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    hdr ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** S-family: CommonCrawl WET ingest ([[graft.sources.Warc.wetText]])
    * — the crawl's PRE-EXTRACTED text distribution, which most text
    * pipelines actually start from. Synthesizes a WET capture of
    * closed-form documents interleaved with the records a real WET
    * file carries around them (a leading `warcinfo` header record and
    * periodic `metadata` decoys — both must be routed away by the
    * record-type filter; a skipped-record failure shifts every later
    * rec_no and breaks the hash), stores it in BOTH layouts (plain +
    * per-record gzip members) and reads each back. The oracle
    * recomputes record numbers, uris, the text and its token count
    * purely from the generating formulas — never parsing WARC — so
    * the hash pins record framing, type routing, body-as-text
    * semantics (no payload split in WET) and tokenization at once. */
  val q55WarcWet: Q = Q(
    "q55_warc_wet",
    s"""WITH r AS (SELECT i FROM range($WetDocs) t(i)),
       |d AS (SELECT i,
       |        'doc ' || i || ' ' || trim(repeat('tok ', 1 + i % 4)) AS text,
       |        'http://wet.example/p' || i AS target_uri,
       |        CAST(1 + i + (i + 4) // 5 AS BIGINT) AS rec_no
       |      FROM r),
       |fmts AS (SELECT 'gz' AS fmt, * FROM d
       |         UNION ALL SELECT 'plain' AS fmt, * FROM d)
       |SELECT fmt, rec_no, target_uri, text,
       |       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |FROM fmts ORDER BY fmt, rec_no""".stripMargin) { (s, _) =>
    def docText(i: Int): String =
      s"doc $i " + ("tok " * (1 + i % 4)).trim
    val records: Seq[Array[Byte]] =
      wetDecoy("warcinfo", "", "application/warc-fields",
        "software: graft-wet-synth\r\n") +:
        (0 until WetDocs).flatMap { i =>
          val conv = wetRecord(s"http://wet.example/p$i", docText(i))
          if (i % 5 == 0)
            Seq(conv, wetDecoy("metadata", s"http://wet.example/p$i",
              "application/json", s"""{"Envelope":{"n":$i}}"""))
          else Seq(conv)
        }
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-q55")
    val plainPath = writeAtomic(dir, "cap.warc.wet", records.reduce(_ ++ _))
    val gzBytes = {
      val out = new java.io.ByteArrayOutputStream(1 << 18)
      records.foreach { r =>
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(r); g.finish()
      }
      out.toByteArray
    }
    val gzPath = writeAtomic(dir, "cap.warc.wet.gz", gzBytes)
    def side(path: String, fmt: String) =
      graft.sources.Warc.wetText(s, path)
        .select(lit(fmt).as("fmt"), col("rec_no"), col("target_uri"),
          col("text"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tokens"))
    side(plainPath, "plain").unionAll(side(gzPath, "gz"))
      .orderBy(col("fmt"), col("rec_no"))
  }

  val all: Seq[Q] = Seq(q48CorrelateProto, q49CountersProto, q50DedupProto,
    q51PcapChunked, q52WarcIngest, q53WarcCurate, q54WarcMedia, q55WarcWet)
}
