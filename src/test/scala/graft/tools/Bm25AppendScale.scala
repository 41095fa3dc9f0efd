package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling receipt for the BM25 index-append claim
  * ([[graft.operators.Bm25.appendToIndex]]): an append tick costs the
  * BATCH scan plus the affected buckets' rewrite — so as the standing
  * index grows at a FIXED batch size, the tick's cost must grow only
  * with the (bounded) bucket payload it rewrites, while the naive
  * alternative — rebuild the whole index per ingest tick — grows
  * linearly with the corpus. At 100 TB the rebuild is the whole corpus
  * re-tokenized per tick; the append is the batch plus 1/16ths of the
  * postings.
  *
  * Run: sbt "Test/runMain graft.tools.Bm25AppendScale"
  */
object Bm25AppendScale {
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
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage)
      .getOrElse(-1.0)
    println(s"[bm25-append-scale] load avg at start: $load")

    // standing corpus: ~30-token docs over a 2k-word vocabulary (spans
    // all 16 buckets). Two batch shapes:
    //   broad  — same vocabulary: touches every bucket, so the tick
    //            degenerates to ~a postings rewrite (the documented
    //            worst case; the production knob is a larger bucket
    //            count so each rewrite unit stays manageable);
    //   skewed — a 4-word vocabulary (one domain's template storm):
    //            touches ≤ 4 buckets, the granularity the layout buys.
    def corpus(n: Int, idBase: Long) = spark.range(n).select(
      (col("id") + idBase).as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(2000)))): _*).as("text"))
    def skewedBatch(n: Int) = spark.range(n).select(
      (col("id") + 20000000L).as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("narrow"), pmod(hash(col("id") * 31 + j), lit(4)))): _*).as("text"))

    val broad = corpus(2000, 10000000L).cache(); broad.count()
    val skewed = skewedBatch(2000).cache(); skewed.count()

    for (corpusSize <- Seq(10000, 40000, 160000)) {
      val base = corpus(corpusSize, 0L).cache(); base.count()
      // fresh dirs per measured run: append mutates its input
      def freshIndex(): String = {
        val dir = java.nio.file.Files.createTempDirectory(s"bm25scale$corpusSize").toString
        graft.operators.Bm25.buildIndex(base, "doc_id", "text", dir)
        dir
      }
      def appendRuns(batch: org.apache.spark.sql.DataFrame) = (1 to 3).map { _ =>
        val dir = freshIndex()
        time(graft.operators.Bm25.appendToIndex(spark, dir, batch, "doc_id", "text"))
      }
      val broadTimes = appendRuns(broad)
      val skewTimes = appendRuns(skewed)
      val rebuildTimes = (1 to 3).map { _ =>
        val dir = java.nio.file.Files.createTempDirectory(s"bm25rb$corpusSize").toString
        time(graft.operators.Bm25.buildIndex(
          base.unionByName(broad), "doc_id", "text", dir))
      }
      println(f"[bm25-append-scale] corpus=$corpusSize%7d batch=2000 " +
        f"append_skewed=${med(skewTimes)}%6.2fs append_broad=${med(broadTimes)}%6.2fs " +
        f"rebuild=${med(rebuildTimes)}%6.2fs " +
        f"runs skewed=${skewTimes.map(t => f"$t%.2f").mkString(",")} " +
        f"broad=${broadTimes.map(t => f"$t%.2f").mkString(",")} " +
        f"rebuild=${rebuildTimes.map(t => f"$t%.2f").mkString(",")}")
      base.unpersist()
    }
    spark.stop()
  }
}
