package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Decompose q6's cold cost: JVM-first-job overhead vs q6-specific
  * codegen vs data. Runs q1 (cold, absorbs JVM init), then q6 at
  * sf0.001 (cold plan, tiny data -> isolates compile), then q6 at the
  * target SF (warm plan, real data).
  *
  * Run: sbt "Test/runMain graft.tools.Q6Cold /root/testdata/sf0.1"
  */
object Q6Cold {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q1 = SparkEntry.allQueries.find(_.name == "q1_pricing_summary").get
    val q6 = SparkEntry.allQueries.find(_.name == "q6_sessionize").get

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[q6cold] $tag = ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("q1 cold (JVM init absorbed here)") { q1.run(spark, sfDir).count() }
    time("q1 again") { q1.run(spark, sfDir).count() }
    time("q6 cold @ sf0.001 (compile, tiny data)") { q6.run(spark, "/root/testdata/sf0.001").count() }
    time("q6 warm @ target") { q6.run(spark, sfDir).count() }
    time("q6 warm again") { q6.run(spark, sfDir).count() }
    spark.stop()
  }
}
