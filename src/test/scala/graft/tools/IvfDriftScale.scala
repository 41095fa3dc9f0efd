package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Ann

/** Geometry-drift receipt for the committed IVF index: the lifecycle
  * FREEZES centroids at build time (appends assign under trained
  * geometry; retraining is an offline rebuild), so this receipt
  * quantifies when that breaks — append progressively drifted batches
  * at 1×/2×/4× the trained mass and read, from the committed
  * artifacts alone ([[graft.operators.Ann.ivfGeometryDrift]]):
  *
  *   - per-version fixed-point mean cosine to the assigned centroid —
  *     the monitoring signal (falls as appended mass leaves the
  *     trained distribution);
  *   - served recall@5 vs the exact scan over the same committed
  *     corpus — the quality the drift actually costs.
  *
  * The alarm a 100 TB deployment wires: REBUILD when the latest
  * appended version's mean_cos_fp drops more than ~10% below the
  * build version's — at that point this receipt shows recall falling
  * from ~1.0 toward the point where probing nprobe cells misses
  * drifted mass.
  *
  * Run: sbt "Test/runMain graft.tools.IvfDriftScale"
  */
object IvfDriftScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val dim = 32
    val trueCenters = 16
    val baseN = 8000
    val queriesN = 50
    val nprobe = 4
    val k = 5

    // deterministic synthetic mixture: cluster centers on the unit
    // sphere, members = center + small noise; drifted batches pull
    // members toward a DIFFERENT center set by `drift` in [0, 1]
    val rnd = new scala.util.Random(41)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centersA = Array.fill(trueCenters)(unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val centersB = Array.fill(trueCenters)(unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    def sample(n: Int, idBase: Long, drift: Double): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val c = rnd.nextInt(trueCenters)
        val v = Array.tabulate(dim) { j =>
          ((1.0 - drift) * centersA(c)(j) + drift * centersB(c)(j) +
            0.15 * rnd.nextGaussian()).toFloat
        }
        (idBase + i, v.toSeq)
      }

    val base = sample(baseN, 0L, drift = 0.0)
    // two probes: queries from the TRAINED distribution (geometry fits)
    // and from the DRIFTED one (the mass the frozen centroids misplace)
    val qTrained = sample(queriesN, 10000000L, drift = 0.0).toDF("qid", "qvec")
    val qDrifted = sample(queriesN, 20000000L, drift = 0.85).toDF("qid", "qvec")

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"ivf_drift window load=$load base=${baseN}x${dim}d cells=$trueCenters " +
      s"nprobe=$nprobe queries=$queriesN")

    val dir = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    val baseDf = base.toDF("cid", "cvec")
    val init = Ann.kmeansParallelInit(baseDf, "cid", "cvec", trueCenters)
    val cents = Ann.kmeansCentroids(baseDf, "cvec", init, iters = 5)
    Ann.ivfIndexBuild(baseDf, dir, cents)

    def recallAt5(queries: org.apache.spark.sql.DataFrame): Double = {
      val exact = Ann.bruteForceTopK(Ann.readIvfCells(spark, dir)
          .select(col("cid"), col("cvec")), queries, k)
        .select(col("qid"), col("cid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val served = Ann.ivfServedTopK(spark, dir, queries, k, nprobe)
        .select(col("qid"), col("cid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = exact.map { case (q, ex) =>
        served.getOrElse(q, Set.empty).count(ex).toDouble / k
      }
      hits.sum / hits.size
    }

    def report(tag: String): Unit = {
      val drift = Ann.ivfGeometryDrift(spark, dir).collect()
      val byVer = drift.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3))).toMap
      val buildMean = byVer(1L)._2
      val latest = byVer(byVer.keys.max)
      println(f"ivf_drift $tag%-10s versions=${byVer.size}%2d " +
        f"build_mean_cos_fp=$buildMean%7d latest_mean_cos_fp=${latest._2}%7d " +
        f"latest_n=${latest._1}%6d recall5_trained=${recallAt5(qTrained)}%.3f " +
        f"recall5_drifted=${recallAt5(qDrifted)}%.3f")
    }

    report("mass=0x")
    var idBase = 1000000L
    for ((mult, drift) <- Seq((1, 0.35), (2, 0.6), (4, 0.85))) {
      val batch = sample(baseN * mult, idBase, drift)
      idBase += baseN * mult
      Ann.ivfIndexAppend(spark, dir, batch.toDF("cid", "cvec"))
      report(s"mass=${mult}x")
    }
    spark.stop()
  }
}
