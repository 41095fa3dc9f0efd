package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling receipt for the round-11 media-dedup work (VERDICT r10 #1
  * and #2): cost must stay FLAT as the identical-media family grows.
  *
  *   1. the guarded pigeonhole kernel over a signature table with a
  *      growing identical family (the crawl mega-bucket) under the
  *      maxBucket cap — distinct-signature pairing means kernel work is
  *      bounded by signature diversity, so 10x the duplicates must not
  *      move the wall time;
  *   2. the composed MediaDedup exact+perceptual lanes over a corpus
  *      with a growing byte-identical duplication factor — the md5 lane
  *      grows linearly (one hash per row) while the DECODE count stays
  *      constant (distinct contents only), so wall time grows far
  *      slower than rows.
  *
  * Run: sbt "Test/runMain graft.tools.MediaScale"
  */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"media_scale window load=$load")

    // 1. kernel: 96 clustered signatures + an identical mega-family
    val rnd = new scala.util.Random(7)
    val bases = Seq.fill(24)(rnd.nextLong())
    val clustered = bases.flatMap(b => Seq(b, b ^ 1L, b ^ (1L << 17), rnd.nextLong()))
    for (famN <- Seq(10000, 100000, 1000000)) {
      val sigs = clustered.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("img_id", "dhash")
        .unionAll(spark.range(famN.toLong)
          .select((col("id") + 1000000L).as("img_id"), lit(42L).as("dhash")))
      // warm once, then 3 timed runs; cap 256 — the serving config
      def run(): Unit = assert(graft.operators.ImageDedup
        .nearPairs(sigs, maxDist = 3, maxBucket = 256).count() >= 0)
      run()
      val runs = Seq.fill(3)(time(run()))
      println(f"kernel_capped fam=$famN tasks_flat median=${med(runs)}%.2f " +
        f"runs=${runs.map(t => f"$t%.2f").mkString(",")}")
    }

    // 2. composed media_dedup: 24 distinct PNG contents, duplication
    // factor growing 4 -> 40 -> 400 (96 -> 9600 rows); decode count
    // stays 24-ish per partition while rows grow 100x
    def png(c: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var py = 0
      while (py < 16) {
        var px = 0
        while (px < 18) {
          val g = (40 + (c * 13 + px * 11 + py * 7) % 160).toInt
          img.setRGB(px, py, (g << 16) | (g << 8) | g)
          px += 1
        }
        py += 1
      }
      graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    }
    for (dup <- Seq(4, 40, 400)) {
      val media = spark.range(24L * dup).as[Long]
        .map(i => (i, png(i % 24))).toDF("img_id", "png")
      def run(): Unit = assert(graft.operators.MediaDedup
        .imageDedup(media, "img_id", "png", maxDist = 3).count() == 24L * dup)
      run()
      val runs = Seq.fill(3)(time(run()))
      println(f"media_dedup rows=${24 * dup} median=${med(runs)}%.2f " +
        f"runs=${runs.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
