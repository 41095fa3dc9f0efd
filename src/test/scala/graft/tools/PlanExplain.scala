package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Write `explain("formatted")` for named queries to plans/<tag>/ —
  * the optimization rounds' plan-evidence artifact (guide §1: capture
  * the plan shape — Exchange count, join strategy, PushedFilters —
  * before and after every change).
  *
  * Run: sbt "Test/runMain graft.tools.PlanExplain <tag> <sfDir> <q1> <q2> ..."
  * (or `all` for every declared query). Files land at
  * plans/<tag>/<query>_<suffix>.txt with suffix from
  * SPARK_GRAFT_PLAN_SUFFIX (default "before").
  *
  * Mirrors the bench session config (local[32], shuffle.partitions=32,
  * AQE on / coalescing off) so the captured initial plans are the ones
  * the bench actually runs.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("r17")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val names = args.drop(2).toSeq
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val repo = sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", ".")
    val outDir = Paths.get(repo, "plans", tag)
    Files.createDirectories(outDir)
    val qs =
      if (names == Seq("all")) SparkEntry.allQueries
      else names.map(n => SparkEntry.allQueries.find(_.name == n)
        .getOrElse(sys.error(s"unknown query: $n")))
    qs.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${q.name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        System.err.println(s"[plan] wrote ${q.name}_$suffix.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[plan] ${q.name} FAILED: $e")
      }
    }
    spark.stop()
  }
}
