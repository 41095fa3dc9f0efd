package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{WarcDoc, WarcStream}

/** Streaming WARC drop-dir ingestion: files landing in the watch dir
  * surface as parsed, text-extracted documents; stateless, so
  * [[StreamSync.drain]]'s `processAllAvailable()` is deterministic. */
class WarcStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private def rec(uri: String, html: String): Array[Byte] = {
    val body = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n").getBytes("UTF-8")
  }

  test("dropped plain and gz files stream out as extracted text docs") {
    val dir = java.nio.file.Files.createTempDirectory("warcdrop")
    val q = WarcStream.textDocs(spark, dir.toString)
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      // drop a plain file with two pages
      val plain = rec("http://s/1", "<p>one &amp; two</p>") ++
        rec("http://s/2", "<div>three</div>")
      java.nio.file.Files.write(dir.resolve("a.warc"), plain)
      // drop a gz file (one member per record)
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(rec("http://s/3", "<span>four</span>")); g.finish()
      java.nio.file.Files.write(dir.resolve("b.warc.gz"), out.toByteArray)

      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM warc_stream").count() == 3
      })
      val got = spark.sql("SELECT * FROM warc_stream").as[WarcDoc]
        .collect().map(d => d.targetUri -> d.text).toMap
      assert(got("http://s/1") === "one & two")
      assert(got("http://s/2") === "three")
      assert(got("http://s/3") === "four")

      // late arrival: only the new file's docs appear
      java.nio.file.Files.write(dir.resolve("c.warc"),
        rec("http://s/4", "<p>five</p>"))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM warc_stream").count() == 4
      })
    } finally q.stop()
  }
}
