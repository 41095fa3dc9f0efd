package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 scale receipt for the index EXPORT (deep clone): the copy
  * is REFERENCED-FILE-bound — as a standing BM25 index accumulates
  * dead history (upsert ticks superseding earlier versions without a
  * vacuum), the source data dir grows with every cycle while the
  * exported clone's bytes track only the LIVE index mass. The export
  * is thus also an implicit full compaction of dead history: promote
  * a long-lived index without paying for (or waiting on) its garbage.
  *
  * Run: sbt "Test/runMain graft.tools.ExportScale"
  */
object ExportScale {
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

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"export_scale window load=$load corpus=8000 docs, " +
      "upsert cycles over a fixed slice (no vacuum: history accumulates)")

    val docs = (0 until 8000).map(i =>
      (i.toLong, s"w${i % 37} w${i % 101} common shared body token$i"))
    val dir = java.nio.file.Files.createTempDirectory("expscale").toString
    graft.operators.Bm25.buildIndex(
      docs.toDF("doc_id", "text"), "doc_id", "text", dir)
    val slice = docs.filter(_._1 % 13 == 4)
      .map { case (id, t) => (id, t + " revised") }.toDF("doc_id", "text")
      .cache()
    slice.count()

    val q = Seq((1L, "common"), (2L, "w11"), (3L, "shared")).toDF("qid", "term")
    def serve(d: String) = graft.operators.Bm25.serveTopK(spark, d, q, k = 5)
      .orderBy(col("qid"), col("rank"))
      .collect().map(_.toSeq).toSeq

    for (cycles <- Seq(0, 4, 8, 16)) {
      val prev = graft.operators.Bm25.readManifest(spark, dir).version
      val want = cycles - (prev - 1).toInt
      (0 until want).foreach { _ =>
        graft.operators.Bm25.upsertIndex(spark, dir, slice, "doc_id", "text")
      }
      val srcKb = dirBytes(s"$dir/data") / 1024
      val clone = java.nio.file.Files
        .createTempDirectory(s"expscale_c$cycles").toString + "/c"
      val expT = time { graft.operators.Bm25.exportIndex(spark, dir, clone) }
      val cloneKb = dirBytes(s"$clone/data") / 1024
      val same = serve(clone) == serve(dir)
      println(f"export_scale cycles=$cycles%3d src_data_kb=$srcKb%7d " +
        f"clone_data_kb=$cloneKb%6d export=$expT%5.2fs serve_equal=$same " +
        "(clone bytes track the LIVE mass, not the history)")
      require(same, "clone must serve bit-identically")
    }
    spark.stop()
  }
}
