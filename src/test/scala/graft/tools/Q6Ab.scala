package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-10 adjudication of the q6_sessionize 33x driver-window swing
  * (VERDICT r9 #1: 0.37s committed vs 12.27s in the driver's closing
  * window; q7_correlate 0.45 -> 1.09s in the same window).
  *
  * Protocol (the r7/r8 A/B pattern, one JVM so both variants share the
  * identical window):
  *   1. cold run of q6 FIRST (no warmup) — isolates events-parquet
  *      first-touch + codegen cost, the prime suspect for a one-off
  *      driver-window stall;
  *   2. Bench-identical warmup at sf0.001, clearCache;
  *   3. N interleaved runs q6,q7,q6,q7,... at the target SF with the
  *      Bench GC fence, medians printed;
  *   4. same N q6 runs with AQE coalescePartitions ON (the other r9
  *      suspect) via a runtime conf flip.
  *
  * Run: sbt "Test/runMain graft.tools.Q6Ab /root/testdata/sf0.1 7"
  */
object Q6Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q6 = SparkEntry.allQueries.find(_.name == "q6_sessionize").get
    val q7 = SparkEntry.allQueries.find(_.name == "q7_correlate").get

    def time(f: => Unit): Double = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def fmt(xs: Seq[Double]): String = xs.map(t => f"$t%.2f").mkString(" ")

    // 1. stone-cold first touch: the ONLY run in a driver sweep that
    // pays parquet footer reads + codegen for this plan shape
    val cold6 = time { q6.run(spark, sfDir).count() }
    val cold7 = time { q7.run(spark, sfDir).count() }
    System.err.println(f"[q6ab] COLD (no warmup): q6=$cold6%.2f q7=$cold7%.2f")

    // 2. Bench-identical warmup
    Seq(q6, q7).foreach(q => q.run(spark, "/root/testdata/sf0.001").count())
    spark.sharedState.cacheManager.clearCache()

    // 3. interleaved steady-state
    val t6 = collection.mutable.ArrayBuffer[Double]()
    val t7 = collection.mutable.ArrayBuffer[Double]()
    (1 to runs).foreach { _ =>
      t6 += time { q6.run(spark, sfDir).count() }
      t7 += time { q7.run(spark, sfDir).count() }
    }
    System.err.println(s"[q6ab] q6 runs: ${fmt(t6.toSeq)}  median=${f"${med(t6.toSeq)}%.2f"}")
    System.err.println(s"[q6ab] q7 runs: ${fmt(t7.toSeq)}  median=${f"${med(t7.toSeq)}%.2f"}")

    // 4. AQE coalesce ON — the other named suspect for the swing
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val t6c = (1 to runs).map(_ => time { q6.run(spark, sfDir).count() })
    System.err.println(s"[q6ab] q6 coalesce=ON runs: ${fmt(t6c)}  median=${f"${med(t6c)}%.2f"}")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    // 5. synthetic contention: 32 spinner threads (standing in for the
    // driver's concurrent DuckDB oracle suite on the same 32 cores) —
    // does q6 degrade disproportionately vs the q1 reference?
    @volatile var stop = false
    val spinners = (0 until 32).map { i =>
      val t = new Thread(() => { var x = 0L; while (!stop) { x += 1 }; require(x >= 0) }, s"spin-$i")
      t.setDaemon(true); t.start(); t
    }
    val q1 = SparkEntry.allQueries.find(_.name == "q1_pricing_summary").get
    val t6s = collection.mutable.ArrayBuffer[Double]()
    val t1s = collection.mutable.ArrayBuffer[Double]()
    (1 to runs).foreach { _ =>
      t6s += time { q6.run(spark, sfDir).count() }
      t1s += time { q1.run(spark, sfDir).count() }
    }
    stop = true
    spinners.foreach(_.join(1000))
    System.err.println(s"[q6ab] q6 under 32-thread contention: ${fmt(t6s.toSeq)}  median=${f"${med(t6s.toSeq)}%.2f"}")
    System.err.println(s"[q6ab] q1 under 32-thread contention: ${fmt(t1s.toSeq)}  median=${f"${med(t1s.toSeq)}%.2f"}")
    spark.stop()
  }
}
