package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sizing receipt for the committed minhash index
  * ([[graft.operators.MinhashIndex]]) — the third standing lifecycle's
  * cost levers, measured on one corpus at three bucket counts:
  *
  *   - the ADMISSION tick's cost is bucket-count-INdependent (the gate
  *     reads all signature rows column-pruned; the append lands only
  *     the admitted rows' buckets);
  *   - the ID-ONLY DELETE is the best-localized takedown of the three
  *     indexes: sid→bucket is a pure function, so a fixed small
  *     takedown batch reads+rewrites ≤ |ids| buckets and the bytes
  *     fall ~1/B as B grows — NO scan participates in locating the
  *     work (contrast Bm25.deleteByIds' scanned_kb in
  *     Bm25BucketScale).
  *
  * Run: sbt "Test/runMain graft.tools.MinhashIndexScale"
  */
object MinhashIndexScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) return 0L
      val s = java.nio.file.Files.walk(root)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(java.nio.file.Files.size(_)).sum
      finally s.close()
    }

    // 20k docs x 30 tokens, same shape as Bm25BucketScale; the admit
    // batch is novel (disjoint vocabulary prefix), the takedown batch
    // a fixed 8 ids
    val corpus = spark.range(20000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(2000)))): _*).as("text"))
      .cache()
    corpus.count()
    val batch = spark.range(2000).select((col("id") + 1000000L).as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("nv"), pmod(hash(col("id") * 131 + j), lit(2000)))): _*).as("text"))
      .cache()
    batch.count()
    val takedown = (0 until 8).map(i => 1000000L + i * 251L)

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"minhash_index_scale window load=$load corpus=20000x30tok " +
      s"admit=2000docs takedown=8ids")

    for (buckets <- Seq(16, 64, 256)) {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory(s"mhis$buckets").toString
      val buildT = time(graft.operators.MinhashIndex
        .build(corpus, "doc_id", "text", dir, 3, 4, 2, buckets))
      val indexKb = dirBytes(s"$dir/data/1/rows") / 1024
      var admitted = 0L
      val admitT = time {
        admitted = graft.operators.MinhashIndex
          .admit(spark, dir, batch, "doc_id", "text", 0.5).appended
      }
      val delT = time(graft.operators.MinhashIndex
        .deleteByIds(spark, dir, takedown.toDF("sid")))
      val m = graft.operators.MinhashIndex.readManifest(spark, dir)
      val delRewritten = m.bucketVersions
        .count(_._2.contains(m.version))
      val delKb = dirBytes(s"$dir/data/${m.version}/rows") / 1024
      println(f"minhash_index_scale buckets=$buckets%4d build=$buildT%5.1fs " +
        f"index_kb=$indexKb%6d admit=$admitT%5.1fs admitted=$admitted%5d " +
        f"del_ids=$delT%5.1fs del_rewritten=$delRewritten%3d del_kb=$delKb%6d")
    }
    spark.stop()
  }
}
