package graft.tools

import org.apache.spark.sql.SparkSession

object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val q = graft.SparkEntry.queries("q6_sessionize")
    // first-touch warmup of the events table scan
    graft.Tables.events(spark, d).count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      q(spark, d).count()
      println(f"[prof] q6 run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = q(spark, d)
    df.count()
    println(df.queryExecution.executedPlan.toString
      .split("\n").filter(l => l.contains("Exchange") || l.contains("Sort") || l.contains("Window") || l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
