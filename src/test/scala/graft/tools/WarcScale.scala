package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.Warc

/** WARC scaling-curve measurement (VERDICT r10 #5): synthesize a
  * CommonCrawl-shaped fixture at three sizes (8 files each — ~12.5 MB,
  * ~50 MB, ~100 MB total) plus one oversized single file for the
  * chunked path, then time the full ingest (records -> response filter
  * -> htmlToText -> count, the q53 front half) median-of-3 per size in
  * ONE window, printing task counts alongside — the evidence for the
  * "~linear cost, >= 8-way parallel" claim in NEXT.md.
  *
  * Run: sbt "Test/runMain graft.tools.WarcScale [/tmp/warcscale]"
  */
object WarcScale {
  def main(args: Array[String]): Unit = {
    val base = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/warcscale"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rec(uri: String, body: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n")
        .getBytes("UTF-8")

    // one deterministic ~2.2 KB page; html so htmlToText does real work
    def page(f: Int, r: Int): String = {
      val words = (0 until 60).map(w => s"tok${(f * 131 + r * 17 + w * 7) % 997}")
      s"<html><head><style>a{}</style></head><body><h1>Page $f-$r</h1>" +
        words.grouped(10).map(g => s"<p>${g.mkString(" ")}</p>").mkString +
        ("<div>" + ("filler " * 150) + "</div>") + "</body></html>"
    }

    def writeFixture(dir: java.nio.file.Path, files: Int, bytesPerFile: Long): Unit = {
      java.nio.file.Files.createDirectories(dir)
      (0 until files).foreach { f =>
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(dir.resolve(f"seg$f%02d.warc")), 1 << 20)
        var written = 0L
        var r = 0
        while (written < bytesPerFile) {
          val b = rec(s"http://host$f.example/p$r", page(f, r))
          out.write(b); written += b.length; r += 1
        }
        out.close()
      }
    }

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val sizesMb = Seq(12.5, 50.0, 100.0)
    val fixtures = sizesMb.map { mb =>
      val dir = base.resolve(s"mb${mb.toInt}")
      if (!java.nio.file.Files.exists(dir.resolve("seg00.warc")))
        writeFixture(dir, 8, (mb * 1024 * 1024 / 8).toLong)
      (mb, dir)
    }
    // oversized single file for the chunked path: 64 MB, 8 MB chunks
    val bigDir = base.resolve("big")
    if (!java.nio.file.Files.exists(bigDir.resolve("seg00.warc")))
      writeFixture(bigDir, 1, 64L * 1024 * 1024)
    val big = bigDir.resolve("seg00.warc").toString

    def ingest(path: String): Long = {
      import org.apache.spark.sql.functions.col
      Warc.records(spark, path)
        .filter(col("recType") === "response")
        .select(Warc.htmlToText(Warc.httpPayload(col("body").cast("string"))).as("text"))
        .count()
    }

    // warm the JIT + readers once at the smallest size
    ingest(fixtures.head._2.toString + "/*.warc")
    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"warc_scale window load=$load")
    fixtures.foreach { case (mb, dir) =>
      val path = dir.toString + "/*.warc"
      val parts = Warc.records(spark, path).rdd.getNumPartitions
      val runs = Seq.fill(3)(time(ingest(path)))
      println(f"warc_scale mb=$mb%.1f tasks=$parts median=${med(runs)}%.2f " +
        f"runs=${runs.map(t => f"$t%.2f").mkString(",")}")
    }
    val partsBig = Warc.recordsChunked(spark, big, 8L * 1024 * 1024).rdd.getNumPartitions
    val runsBig = Seq.fill(3)(time {
      Warc.recordsChunked(spark, big, 8L * 1024 * 1024).count()
    })
    println(f"warc_chunked mb=64.0 tasks=$partsBig median=${med(runsBig)}%.2f " +
      f"runs=${runsBig.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
