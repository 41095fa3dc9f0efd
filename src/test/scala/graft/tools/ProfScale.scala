package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling receipt for the round-11 profiling work: the heavy-hitter
  * two-pass scheme's claim is that its SHUFFLE is bounded by the
  * candidate count (≤ k per partition), not the vocabulary — the
  * full-groupBy alternative shuffles every distinct term to keep ~k.
  * So as the vocabulary grows at fixed row count, the two-pass cost
  * must stay flat-ish while the exact-definition groupBy pays for the
  * growing distinct-key exchange; and the shuffled-byte counters must
  * show the gap directly.
  *
  * Run: sbt "Test/runMain graft.tools.ProfScale"
  */
object ProfScale {
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
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // shuffle-byte capture: the structural quantity the claim is about —
    // wall time at this toy scale is scheduling floor, but the bytes a
    // 1000-executor cluster must move grow exactly like these counters
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffled.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def shuffleBytes(f: => Unit): Long = {
      shuffled.set(0); f
      // listener events are async: wait until the counter goes quiet
      var prev = -1L
      while (prev != shuffled.get()) { prev = shuffled.get(); Thread.sleep(200) }
      shuffled.get()
    }
    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"prof_scale window load=$load")

    val k = 100
    // fixed 2M-token stream; vocabulary (distinct tail terms) grows 100x.
    // 20% of occurrences are the planted heavy hitter, the rest a
    // uniform tail — exactly the crawl shape (few dominant boilerplate
    // tokens over an enormous unique-ish tail).
    for (vocab <- Seq(10000, 100000, 1000000)) {
      val docs = spark.range(0, 100000).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          lit("hh hh hh hh"),
          expr(s"concat('t', CAST(hash(id, 1) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 2) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 3) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 4) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 5) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 6) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 7) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 8) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id, 9) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,10) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,11) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,12) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,13) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,14) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,15) % $vocab AS STRING))"),
          expr(s"concat('t', CAST(hash(id,16) % $vocab AS STRING))")
        ).as("text")).persist()
      docs.count()

      val twoPass = (1 to 5).map(_ => time {
        graft.operators.Profiling.heavyHitters(docs, "text", k)
          .collect()
      })
      val tok = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      val fullGroupBy = (1 to 5).map(_ => time {
        val n = tok.count()
        tok.groupBy("t").count().filter(col("count") * k > n).collect()
      })
      val twoPassBytes = shuffleBytes {
        graft.operators.Profiling.heavyHitters(docs, "text", k).collect()
      }
      val fullBytes = shuffleBytes {
        val n = tok.count()
        tok.groupBy("t").count().filter(col("count") * k > n).collect()
      }
      println(f"vocab=$vocab%8d two_pass=${med(twoPass)}%.2fs (${twoPassBytes / 1024}%d KiB shuffled) " +
        f"full_groupby=${med(fullGroupBy)}%.2fs (${fullBytes / 1024}%d KiB shuffled)")
      docs.unpersist()
    }
    spark.stop()
  }
}
