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

  private def mediaRec(uri: String, ctype: String, payload: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n").getBytes("UTF-8") ++ payload
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("streaming multimodal ingest: WARC drop dir through the media curation gates") {
    import graft.multimodal.Multimodal.JvmImageCodec
    def png(seed: Int, uniform: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = if (uniform) 128 else 40 + (x * 11 + y * 7 + seed) % 160
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      JvmImageCodec.encodePng(img)
    }
    val dir = java.nio.file.Files.createTempDirectory("warcmediadrop")
    val keeper = png(1, uniform = false)
    val cap = mediaRec("http://m/0.png", "image/png", keeper) ++
      mediaRec("http://m/1.png", "image/png", keeper) ++ // byte-identical dup
      mediaRec("http://m/2.png", "image/png", png(2, uniform = true)) ++ // gated: uniform
      mediaRec("http://m/3.html", "text/html", "<html/>".getBytes("UTF-8")) // routed away
    val survivors = graft.streaming.MediaCurateStream.gateExactWithinWatermark(
      WarcStream.mediaPayloads(spark, dir.toString, "image/"),
      idCol = "rec_no", bytesCol = "payload", eventTimeCol = "arrival_ts",
      delay = "10 seconds", minW = 8, minH = 8, minSpread = 10, maxAspect = 4)
    val q = survivors.writeStream.format("memory").queryName("warc_media_stream")
      .outputMode("append").start()
    try {
      java.nio.file.Files.write(dir.resolve("m.warc"), cap)
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM warc_media_stream").count() == 1
      })
      // only the first copy of the non-uniform image survives: the dup
      // collapses in the md5 state, the uniform gates, the html routes
      val got = spark.sql("SELECT media_id FROM warc_media_stream")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(0L))
    } finally q.stop()
  }
}
