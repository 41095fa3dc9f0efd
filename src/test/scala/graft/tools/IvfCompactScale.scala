package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-amplification receipt for the IVF COMPACT tick
  * ([[graft.operators.Ann.ivfIndexCompact]]): a streaming deployment's
  * appends accrete one file group per cell per tick, so a serve reads
  * ever more (and ever smaller) parquet files per probed cell. This
  * measures, at three fragmentation depths (4 / 16 / 64 append ticks
  * over one base build):
  *
  *   - files/cell and the probed-cells file count a serve actually
  *     lists (the load-independent byte/file columns are the claim —
  *     wall times on this box are tenant-noisy);
  *   - the same counts after ONE compact + vacuum: every cell
  *     collapses to one file group, independent of the append depth;
  *   - serve parity (the compaction must be physically invisible).
  *
  * Run: sbt "Test/runMain graft.tools.IvfCompactScale"
  */
object IvfCompactScale {
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
    val dim = 32
    def vec(seed: Int) = Seq.tabulate(dim)(j =>
      (((seed * 31 + j * 17) % 29) - 14).toFloat / 7f)
    val cells = 16
    val cents = Array.tabulate(cells)(c => vec(c * 97 + 5).toArray)
    val queries = (0 until 50).map(i => (i.toLong, vec(i + 900000)))
      .toDF("qid", "qvec").cache()
    queries.count()

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"ivf_compact_scale window load=$load base=8000x${dim}d " +
      s"cells=$cells appends of 500 vecs each, nprobe=4 k=5 q=50")

    for (ticks <- Seq(4, 16, 64)) {
      val dir = java.nio.file.Files.createTempDirectory(s"ivfcs$ticks").toString
      graft.operators.Ann.ivfIndexBuild(
        (100000 until 108000).map(i => (i.toLong, vec(i))).toDF("cid", "cvec"),
        dir, cents)
      (0 until ticks).foreach { t =>
        graft.operators.Ann.ivfIndexAppend(spark, dir,
          (t * 500 until (t + 1) * 500).map(i => (i.toLong, vec(i)))
            .toDF("cid", "cvec"))
      }
      def filesPerCellStats(): (Long, Double, Long) = {
        val m = graft.operators.Ann.readIvfManifest(spark, dir)
        val counts = m.cellVersions.toSeq.map { case (c, vs) =>
          vs.distinct.map { v =>
            val d = new java.io.File(s"$dir/data/$v/cells/cell=$c")
            Option(d.listFiles()).getOrElse(Array.empty)
              .count(_.getName.endsWith(".parquet")).toLong
          }.sum
        }
        (counts.max, counts.sum.toDouble / counts.size, counts.sum)
      }
      def serve() = graft.operators.Ann
        .ivfServedTopK(spark, dir, queries, k = 5, nprobe = 4)
        .orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
      val (maxB, avgB, totB) = filesPerCellStats()
      var before: Seq[Seq[Any]] = Seq.empty
      val serveBeforeT = time { before = serve() }
      val compactT = time(
        graft.operators.Ann.ivfIndexCompact(spark, dir, minVersions = 2))
      graft.operators.Ann.ivfVacuum(spark, dir, graceVersions = 0L)
      val (maxA, avgA, totA) = filesPerCellStats()
      var after: Seq[Seq[Any]] = Seq.empty
      val serveAfterT = time { after = serve() }
      require(before == after, "compaction must be physically invisible")
      println(f"ticks=$ticks%-3d files/cell max $maxB%3d -> $maxA%3d  " +
        f"avg $avgB%6.1f -> $avgA%5.1f  total $totB%5d -> $totA%4d  " +
        f"serve ${serveBeforeT}%5.2fs -> ${serveAfterT}%5.2fs  " +
        f"compact=${compactT}%5.2fs  parity=ok")
    }
    spark.stop()
  }
}
