package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off profiling harness for t40_bm25_batch: counts Spark jobs and
  * prints per-run wall time so plan-overhead hypotheses are measurable
  * (the Q6Ab discipline applied to the round-11 cost leader).
  *
  * Run: sbt "Test/runMain graft.tools.T40Profile"
  */
object T40Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    val d = "/root/testdata/sf0.1"
    def run(): Double = {
      val t0 = System.nanoTime()
      val df = graft.queries.Corpus.t40Bm25Batch.run(spark, d)
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    for (i <- 1 to 3) {
      jobs.set(0); stages.set(0)
      val t = run()
      Thread.sleep(300)
      println(f"[t40-profile] run $i: ${t}%5.2f s, jobs=${jobs.get()}, stages=${stages.get()}")
    }
    spark.stop()
  }
}
