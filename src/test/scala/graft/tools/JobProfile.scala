package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Where do a query's seconds go? Runs named queries once warm + once
  * measured under a SparkListener and prints every JOB the run
  * launched: wall-clock, stage/task counts, summed task time — the
  * guide §1/§7 empirical loop without a UI (spark.ui is off in the
  * sandbox). A query whose wall-clock is 10 jobs x 0.2 s is driver/
  * scheduling-bound (fix: fewer actions/pins/broadcast round-trips);
  * one job dominating is compute-bound (fix: the plan inside it).
  *
  * Run: sbt "Test/runMain graft.tools.JobProfile <sfDir> <q1> <q2> ..."
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // conf A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" (profiling only)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").iterator
      .flatMap(_.split(";")).map(_.split("=", 2))
      .foreach { case Array(k, v) => builder.config(k, v); case _ => () }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, desc, System.nanoTime())
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.end = System.nanoTime())
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId)
            .flatMap(jobs.get).foreach { j =>
              j.stages += 1
              j.tasks += e.stageInfo.numTasks
              j.taskMs += e.stageInfo.taskMetrics.executorRunTime
            }
        }
    }

    names.foreach { name =>
      val q = SparkEntry.allQueries.find(_.name == name)
        .getOrElse(sys.error(s"unknown query: $name"))
      // uncharged warm run: codegen + index-cache builds land here
      try q.run(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[prof] warm $name failed: $e") }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; let the tail events drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      System.err.println(f"===== $name wall=$wall%.3f s =====")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val w = if (j.end > 0) (j.end - j.start) / 1e9 else Double.NaN
          System.err.println(f"  job ${j.id}%3d ${w}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskMs / 1000.0}%7.2f s  ${j.desc.take(80)}")
        }
        val sum = jobs.values.map(j => (j.end - j.start) / 1e9).sum
        System.err.println(f"  jobs=${jobs.size} sum(jobWall)=$sum%.3f s (gaps = driver-side planning/IO)")
      }
      // per-operator SQL metrics of the LAST executed plan (post-AQE):
      // WholeStageCodegen duration + per-node output rows — maps the
      // task-time mass back to plan operators without a UI
      if (sys.env.contains("SPARK_GRAFT_PROF_PLAN")) {
        val df2 = q.run(spark, sfDir)
        // execute THIS QueryExecution (df2.count() would plan a fresh
        // one, leaving df2's metrics at zero)
        df2.queryExecution.executedPlan.execute().count()
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          p.foreach { n =>
            val interesting = n.metrics.filter { case (k, m) =>
              (k == "numOutputRows" || k.contains("duration") ||
                k.contains("Time") || k.contains("time")) && m.value > 0
            }
            if (interesting.nonEmpty)
              System.err.println("  [plan] " + n.nodeName + "  " +
                interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" "))
            n match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
              case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(s.plan)
              case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
                walk(b.child)
              case _ => ()
            }
          }
        }
        walk(df2.queryExecution.executedPlan)
      }
    }
    spark.stop()
  }
}
