package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump executed plans of named queries at sf0.001 for plan iteration.
  * Run: sbt "Test/runMain graft.tools.PlanDump v14_semdedup t35_boilerplate"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val q = SparkEntry.allQueries.find(_.name == name).get
      System.err.println(s"===== $name =====")
      System.err.println(q.run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
