package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC reader totality and the HTML→text chain. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def rec(recType: String, uri: String, body: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: $recType\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n").getBytes("UTF-8")

  private def write(name: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Files.createTempDirectory("warc").resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("parses records in order with headers and exact body bytes") {
    val path = write("a.warc", rec("response", "http://a/1", "hello world") ++
      rec("metadata", "http://a/2", "k: v"))
    val rows = Warc.records(spark, path).orderBy("recNo").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("recType") === "response")
    assert(new String(rows(0).getAs[Array[Byte]]("body"), "UTF-8") === "hello world")
    assert(rows(1).getAs[String]("targetUri") === "http://a/2")
    assert(rows(1).getAs[Long]("contentLength") === 4L)
  }

  test("wetText / watJson route the CommonCrawl companion record types") {
    val path = write("c.warc.wet",
      rec("warcinfo", "", "software: synth\r\n") ++
        rec("conversion", "http://c/1", "extracted body text one") ++
        rec("metadata", "http://c/1", """{"Envelope":{"n":1}}""") ++
        rec("conversion", "http://c/2", "another body") ++
        rec("metadata", "http://c/2", """{"Envelope":{"n":2}}"""))
    val wet = Warc.wetText(spark, path).orderBy("rec_no").collect()
    assert(wet.map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1L, "http://c/1", "extracted body text one"),
        (3L, "http://c/2", "another body")))
    val wat = Warc.watJson(spark, path).orderBy("rec_no").collect()
    assert(wat.length == 2)
    // the JSON payload is genuinely parseable downstream
    import org.apache.spark.sql.functions.get_json_object
    val ns = Warc.watJson(spark, path)
      .select(get_json_object(org.apache.spark.sql.functions.col("json"),
        "$.Envelope.n").cast("long"))
      .orderBy("rec_no").collect().map(_.getLong(0)).toSeq
    assert(ns == Seq(1L, 2L))
  }

  test("truncated tail ends the file instead of failing the job") {
    val good = rec("response", "http://a/1", "complete")
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort".getBytes("UTF-8")
    val path = write("b.warc", good ++ bad)
    val rows = Warc.records(spark, path).collect()
    assert(rows.length === 1)
    assert(new String(rows(0).getAs[Array[Byte]]("body"), "UTF-8") === "complete")
  }

  test("garbage and empty files parse to zero records") {
    assert(Warc.records(spark, write("c.warc", Array[Byte](1, 2, 3, 4))).count() === 0)
    assert(Warc.records(spark, write("d.warc", Array.empty[Byte])).count() === 0)
    assert(Warc.records(spark, write("e.warc",
      "NOTWARC/9 nonsense\r\n\r\n".getBytes("UTF-8"))).count() === 0)
  }

  test("multi-member gzip reads every member; single-member whole-file gzip too") {
    val out = new java.io.ByteArrayOutputStream()
    Seq(rec("response", "http://g/1", "one"), rec("response", "http://g/2", "two"))
      .foreach { r =>
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(r); g.finish()
      }
    assert(Warc.records(spark, write("f.warc.gz", out.toByteArray)).count() === 2)
    val whole = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(whole)
    g.write(rec("response", "http://g/3", "three") ++ rec("response", "http://g/4", "four"))
    g.close()
    assert(Warc.records(spark, write("g.warc.gz", whole.toByteArray)).count() === 2)
  }

  test("htmlToText strips script/style/tags, unescapes entities, collapses whitespace") {
    import spark.implicits._
    val html = """<html><head><style>p {x:1}</style><script>if (a<b) f();</script></head>
      |<body><p>A &amp;  B</p><div>&lt;kept&gt;   C&nbsp;D</div></body></html>""".stripMargin
    val got = Seq(html).toDF("h").select(Warc.htmlToText(org.apache.spark.sql.functions.col("h")))
      .collect().head.getString(0)
    assert(got === "A & B <kept> C D")
  }

  test("httpPayloadBytes splits on the FIRST header blank line and preserves binary payloads byte-exactly") {
    val spark = SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // payload with invalid-UTF8 bytes AND an embedded \r\n\r\n that
    // must NOT re-split; header is ASCII so char index == byte offset
    val payload = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0xFF.toByte, 0xFE.toByte,
      '\r', '\n', '\r', '\n', 0x00, 0x7F, 0x80.toByte)
    val body = ("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n").getBytes("UTF-8") ++ payload
    val out = Seq(Tuple1(body)).toDF("body")
      .select(Warc.httpPayloadBytes(col("body")).as("p"),
        Warc.httpHeader(col("body")).as("h"))
      .collect().head
    assert(out.getAs[Array[Byte]]("p").toSeq == payload.toSeq)
    assert(out.getString(1) == "HTTP/1.1 200 OK\r\nContent-Type: image/png")
  }

  test("httpPayloadBytes survives non-ASCII header bytes (RFC 7230 obs-text): byte offsets never shift") {
    val spark = SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 0xE9 ('é' in latin-1) inside a header value is NOT valid UTF-8 —
    // a UTF-8 view would decode it to a replacement char and shift the
    // char index off the byte offset; the latin-1 view must not.
    val payload = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0xFF.toByte, '\r', '\n', '\r', '\n', 0x01)
    val hdr = "HTTP/1.1 200 OK\r\nX-Server: caf".getBytes("UTF-8") ++
      Array[Byte](0xE9.toByte) ++ "\r\nContent-Type: image/png\r\n\r\n".getBytes("UTF-8")
    val out = Seq(Tuple1(hdr ++ payload)).toDF("body")
      .select(Warc.httpPayloadBytes(col("body")).as("p"),
        Warc.hasContentType(col("body"), "image/png").as("ct"))
      .collect().head
    assert(out.getAs[Array[Byte]]("p").toSeq == payload.toSeq)
    assert(out.getBoolean(1))
  }

  test("hasContentType: case-insensitive header name/value, line-anchored, no substring false-positives") {
    val spark = SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def body(hdr: String): Array[Byte] = (hdr + "\r\n\r\npayload").getBytes("UTF-8")
    val rows = Seq(
      ("lower", body("HTTP/1.1 200 OK\r\ncontent-type: image/png")),
      ("mixed", body("HTTP/1.1 200 OK\r\nContent-type: IMAGE/PNG")),
      ("canonical", body("HTTP/1.1 200 OK\r\nContent-Type: image/png; charset=binary")),
      // 'content-type: image/png' appears only INSIDE another header's
      // value — a substring match would route this html record as media
      ("decoy", body("HTTP/1.1 200 OK\r\nX-Note: content-type: image/png\r\nContent-Type: text/html")),
      ("absent", body("HTTP/1.1 200 OK\r\nContent-Type: text/html"))
    ).toDF("k", "body")
      .select(col("k"), Warc.hasContentType(col("body"), "image/png").as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows == Map("lower" -> true, "mixed" -> true, "canonical" -> true,
      "decoy" -> false, "absent" -> false))
  }
}
