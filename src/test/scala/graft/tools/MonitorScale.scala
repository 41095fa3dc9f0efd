package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 scale receipt for the DELTA-INCREMENTAL monitoring reads
  * (VERDICT-r16 What's-missing #3 and its IVF sibling): the
  * maintenance-stream alarm verdicts must cost a delta-sized read per
  * tick, not an index-sized one.
  *
  *   - minhash `occupancyVerdict`: reads the per-tick (band, bucket)
  *     count-delta sidecar (`bandstats`) — flat as the index grows;
  *     the pre-sidecar fallback re-scans the band artifact TWICE
  *     (reference + latest) and grows linearly.
  *   - IVF `ivfDriftVerdict`: reads the per-(version, cell)
  *     (n, Σcos_fp) sidecar (`cellstats`) — flat; the pre-sidecar
  *     fallback re-scans every committed vector and grows linearly.
  *
  * The legacy rung is produced by stripping the sidecar flag from a
  * COPY of the committed manifest (the flag is the only switch; the
  * sidecar files are ignored without it), so both rungs read the
  * identical committed index and must return identical rows — the
  * receipt asserts that too.
  *
  * Run: sbt "Test/runMain graft.tools.MonitorScale"
  */
object MonitorScale {
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
    // the load-independent receipt: the BYTES each rung must read
    def artifactKb(dir: String, artifact: String): Long = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) return 0L
      val s = java.nio.file.Files.walk(root)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.contains(s"/$artifact/") &&
          !p.getFileName.toString.startsWith("."))
        .map(java.nio.file.Files.size(_)).sum / 1024
      finally s.close()
    }
    def stripFlag(dir: String, flag: String): Unit = {
      val f = graft.operators.ManifestIO.fs(spark, dir)
      val cur = graft.operators.ManifestIO.readText(f,
        new org.apache.hadoop.fs.Path(s"$dir/CURRENT")).trim
      val p = new org.apache.hadoop.fs.Path(s"$dir/manifest/v$cur.txt")
      val body = graft.operators.ManifestIO.readText(f, p)
      graft.operators.ManifestIO.writeText(f, p,
        body.linesIterator.filterNot(_.startsWith(s"$flag=")).mkString("\n") + "\n")
    }

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"monitor_scale window load=$load")

    // ── minhash occupancy verdict: sidecar vs legacy band re-scan ──
    for (n <- Seq(25000, 50000, 100000, 200000)) {
      val docs = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 100).map(j =>
          concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(50000)))): _*).as("text"))
      val dir = java.nio.file.Files.createTempDirectory(s"monMh$n").toString
      graft.operators.MinhashIndex.build(docs, "doc_id", "text", dir,
        n = 5, bands = 8, rowsPerBand = 2, buckets = 16, bandBuckets = 64)
      def verdict() = graft.operators.MinhashIndex
        .occupancyVerdict(spark, dir, growPct = 50).collect().map(_.toSeq).toSeq
      val withSidecar = verdict()
      val tSide = med(Seq.fill(3)(time(verdict())))
      stripFlag(dir, "bandstats")
      val legacyRows = verdict()
      val tLegacy = med(Seq.fill(3)(time(verdict())))
      require(withSidecar == legacyRows, "the two rungs must answer identically")
      println(f"monitor_scale minhash_occupancy docs=$n%7d " +
        f"sidecar=$tSide%5.2fs reads_kb=${artifactKb(dir, "bandstats")}%7d " +
        f"legacy_full_band=$tLegacy%5.2fs reads_kb=${artifactKb(dir, "bands")}%7d " +
        "x2 (ref+latest; identical rows)")
    }

    // ── IVF drift verdict: sidecar vs legacy full-vector re-scan ──
    val dim = 64
    def vec(seed: Int) = Seq.tabulate(dim)(j =>
      (((seed * 31 + j * 17) % 29) - 14).toFloat / 7f)
    val cents = Array.tabulate(64)(c => vec(c * 13 + 1).toArray)
    for (n <- Seq(25000, 50000, 100000, 200000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"monIvf$n").toString
      graft.operators.Ann.ivfIndexBuild(
        spark.range(n).select(col("id").as("cid"),
          array((0 until dim).map(j =>
            ((pmod(hash(col("id") * 31 + j), lit(29)) - 14).cast("double") / lit(7.0))
              .cast("float")): _*)
            .as("cvec")), dir, cents)
      graft.operators.Ann.ivfIndexAppend(spark, dir,
        (1000000 until 1002000).map(i => (i.toLong, vec(i))).toDF("cid", "cvec"))
      def verdict() = graft.operators.Ann
        .ivfDriftVerdict(spark, dir, rebuildDropPct = 25).collect().map(_.toSeq).toSeq
      val withSidecar = verdict()
      val tSide = med(Seq.fill(3)(time(verdict())))
      stripFlag(dir, "cellstats")
      val legacyRows = verdict()
      val tLegacy = med(Seq.fill(3)(time(verdict())))
      require(withSidecar == legacyRows, "the two rungs must answer identically")
      println(f"monitor_scale ivf_drift vectors=$n%7d " +
        f"sidecar=$tSide%5.2fs reads_kb=${artifactKb(dir, "cellstats")}%7d " +
        f"legacy_full_cells=$tLegacy%5.2fs reads_kb=${artifactKb(dir, "cells")}%7d " +
        "(identical rows)")
    }
    spark.stop()
  }
}
