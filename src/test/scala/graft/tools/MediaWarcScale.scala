package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Media-WARC scaling receipt (VERDICT r11 #5 / r12 carried #3): the
  * q54 BINARY route — WARC parse → content-type routing →
  * `httpPayloadBytes` split → composed media curation (gates → exact
  * dedup → perceptual near-dup) — at representative scale: three
  * multi-file fixtures of synthesized noise PNGs (25 / 50 / 100 MB,
  * 8 files each, html decoys interleaved like q54), timed median-of-3
  * in ONE window with task counts printed. Noise PNGs are
  * incompressible and perceptually distinct, so every record pays a
  * REAL decode + dHash — the honest per-byte cost. The claim under
  * test: ≥ 8-way parallelism and ~flat seconds-per-100 MB as the
  * corpus quadruples.
  *
  * Run: sbt "Test/runMain graft.tools.MediaWarcScale [/tmp/mediawarcscale]"
  */
object MediaWarcScale {
  def main(args: Array[String]): Unit = {
    val base = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/mediawarcscale"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~50 KB incompressible PNG: 128x128 RGB noise, seeded per id
    def noisePng(id: Long): Array[Byte] = {
      val rnd = new scala.util.Random(id * 2654435761L + 11)
      val img = new java.awt.image.BufferedImage(128, 128,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var py = 0
      while (py < 128) {
        var px = 0
        while (px < 128) {
          img.setRGB(px, py, rnd.nextInt() & 0xffffff)
          px += 1
        }
        py += 1
      }
      graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    }

    def rawRec(uri: String, body: Array[Byte]): Array[Byte] = {
      val hdr = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
      hdr ++ body ++ "\r\n\r\n".getBytes("UTF-8")
    }

    def writeFixture(dir: java.nio.file.Path, files: Int, bytesPerFile: Long): Unit = {
      java.nio.file.Files.createDirectories(dir)
      (0 until files).foreach { f =>
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(dir.resolve(f"seg$f%02d.warc")), 1 << 20)
        var written = 0L
        var r = 0
        while (written < bytesPerFile) {
          val id = f * 1000000L + r
          val png = noisePng(id)
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n" +
            s"Content-Length: ${png.length}\r\n\r\n").getBytes("UTF-8") ++ png
          val b = rawRec(s"http://media.example/img$id.png", http)
          out.write(b); written += b.length
          if (r % 16 == 0) {
            // decoy html response the content-type route must discard
            val html = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
              s"<html><body>img${id + 500}.png mentioned</body></html>").getBytes("UTF-8")
            val d = rawRec(s"http://media.example/img${id + 500}.png", html)
            out.write(d); written += d.length
          }
          r += 1
        }
        out.close()
      }
    }

    // the q54 binary route, end to end
    def curate(path: String): Long = {
      val pngs = Warc.records(spark, path, minPartitions = 32)
        .filter(col("recType") === "response" &&
          Warc.hasContentType(col("body"), "image/png"))
        .select(
          regexp_extract(col("targetUri"), "img(\\d+)\\.png", 1)
            .cast("long").as("img_id"),
          Warc.httpPayloadBytes(col("body")).as("png"))
      graft.operators.MediaCurate.imageCurate(pngs, "img_id", "png",
        minW = 8, minH = 8, minSpread = 10, maxAspect = 4, maxDist = 3).count()
    }

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val sizesMb = Seq(25.0, 50.0, 100.0)
    val fixtures = sizesMb.map { mb =>
      val dir = base.resolve(s"mb${mb.toInt}")
      if (!java.nio.file.Files.exists(dir.resolve("seg00.warc")))
        writeFixture(dir, 8, (mb * 1024 * 1024 / 8).toLong)
      (mb, dir)
    }

    curate(fixtures.head._2.toString + "/*.warc") // warm JIT + codecs
    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"media_warc_scale window load=$load")
    fixtures.foreach { case (mb, dir) =>
      val path = dir.toString + "/*.warc"
      val parts = Warc.records(spark, path, minPartitions = 32).rdd.getNumPartitions
      val kept = curate(path)
      val runs = Seq.fill(3)(time(curate(path)))
      val m = med(runs)
      println(f"media_warc_scale mb=$mb%.1f tasks=$parts kept=$kept " +
        f"median=$m%.2f sec_per_100mb=${m * 100.0 / mb}%.2f " +
        f"runs=${runs.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
