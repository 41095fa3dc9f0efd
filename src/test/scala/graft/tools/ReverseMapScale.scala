package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 scale receipt for the ACCRETIVE IVF reverse map (the
  * round-16 verdict's "done" bar, cidmap half — the BM25 docmap half
  * rides `Bm25BucketScale`): a fixed vector batch appended to indexes
  * built over 5k / 10k / 20k / 40k members must write FLAT cidmap
  * bytes and flat wall-clock, because the tick writes ONLY batch rows
  * and accretes the manifest lists. The old rewrite-on-append model
  * paid ~N/B existing rows per touched cbucket — with a broad batch
  * touching every cbucket, that was a full reverse-map rewrite per
  * tick, growing linearly with the index.
  *
  * Run: sbt "Test/runMain graft.tools.ReverseMapScale"
  */
object ReverseMapScale {
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
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) return 0L
      val s = java.nio.file.Files.walk(root)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(java.nio.file.Files.size(_)).sum
      finally s.close()
    }

    val dim = 32
    def vec(seed: Int) = Seq.tabulate(dim)(j =>
      (((seed * 31 + j * 17) % 29) - 14).toFloat / 7f)
    val cents = Array.tabulate(64)(c => vec(c * 13 + 1).toArray)
    // a broad 2k batch — touches most cbuckets, the old model's worst case
    val batch = (1000000 until 1002000).map(i => (i.toLong, vec(i))).toDF("cid", "cvec")
      .cache()
    batch.count()

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"ivf_cidmap_scale window load=$load cells=64 dim=$dim batch=2000")

    for (n <- Seq(5000, 10000, 20000, 40000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"ivfrm$n").toString
      graft.operators.Ann.ivfIndexBuild(
        (0 until n).map(i => (i.toLong, vec(i))).toDF("cid", "cvec"), dir, cents)
      val indexKb = dirBytes(s"$dir/data/1") / 1024
      val appendT = med(Seq.fill(3) {
        val t = time(graft.operators.Ann.ivfIndexAppend(spark, dir, batch))
        graft.operators.Ann.ivfIndexDeleteByIds(spark, dir,
          batch.select(col("cid")))
        t
      })
      graft.operators.Ann.ivfIndexAppend(spark, dir, batch)
      val mA = graft.operators.Ann.readIvfManifest(spark, dir)
      val cellsKbA = dirBytes(s"$dir/data/${mA.version}/cells") / 1024
      val cidmapKbA = dirBytes(s"$dir/data/${mA.version}/cidmap") / 1024
      println(f"ivf_cidmap_scale corpus=$n%6d index_kb=$indexKb%7d " +
        f"append=$appendT%5.2fs cells_kb=$cellsKbA%5d cidmap_kb=$cidmapKbA%5d " +
        f"(batch-bounded at any index size)")
    }
    spark.stop()
  }
}
