package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling receipt for the band-bucket-pruned minhash gate (round 16,
  * closing the round-15 verdict's one weak flag): a FIXED 20-doc probe
  * batch gated against committed indexes built over growing corpora of
  * 100-token documents, through BOTH kernels over the SAME index dir —
  *
  *   legacy = the full fan-out ([[graft.operators.Dedup
  *     .minhashLshPairsAcrossIndexed]] over every committed signature
  *     row): reads the whole index INCLUDING the shingle sets (the
  *     bulk of a signature row) and shuffles the entire index as band
  *     rows per probe — cost grows with INDEX size, forever;
  *   banded = the pruned kernel ([[graft.operators.MinhashIndex.gate]]):
  *     reads only the batch's (band, bucket) partitions of the
  *     gs-free band artifact plus the candidates' sid-buckets — the
  *     shingle-set mass is only ever read candidate-bounded.
  *
  * The two must emit identical pairs at every size (asserted). At
  * probe batches that saturate every band partition the banded path
  * still wins on IO (no gs through the exchange) but pays fixed
  * pin/plan overheads — the small-corpus latency trade t58 prices;
  * this receipt shows the asymptotic divergence the 100 TB deployment
  * cares about.
  *
  * Run: sbt "Test/runMain graft.tools.MinhashGateScale"
  */
object MinhashGateScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val N = 3; val Bands = 8; val Rpb = 2
    // fixed 20-doc probe of 100-token docs: 20·8 = 160 (band, bucket)
    // pairs → a real fraction of 1024 band partitions is pruned away
    val batch = spark.range(20).select(
      (col("id") + 10000000L).as("doc_id"),
      concat_ws(" ", (0 until 100).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 13 + j), lit(20000)))): _*).as("text"))
      .cache()
    batch.count()

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"minhash_gate_scale window load=$load batch=20x100tok " +
      s"bands=$Bands bandBuckets=1024")

    for (n <- Seq(25000, 50000, 100000, 200000)) {
      val corpus = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 100).map(j =>
          concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(20000)))): _*).as("text"))
      val dir = java.nio.file.Files.createTempDirectory(s"mhgs$n").toString
      graft.operators.MinhashIndex.build(corpus, "doc_id", "text", dir,
        N, Bands, Rpb, buckets = 64, bandBuckets = 1024)
      var legacy: Set[(Long, Long)] = null
      val tL = med(Seq.fill(3)(time {
        legacy = graft.operators.Dedup.minhashLshPairsAcrossIndexed(batch,
            graft.operators.MinhashIndex.readRows(spark, dir),
            "doc_id", "text", N, Bands, Rpb, 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }))
      var banded: Set[(Long, Long)] = null
      val tB = med(Seq.fill(3)(time {
        banded = graft.operators.MinhashIndex
          .gate(spark, dir, batch, "doc_id", "text", 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }))
      assert(legacy == banded, s"pruned gate must equal the legacy kernel at n=$n")
      println(f"minhash_gate_scale corpus=$n%7d legacy=$tL%6.2fs " +
        f"banded=$tB%6.2fs pairs=${banded.size}%3d")
    }
    spark.stop()
  }
}
