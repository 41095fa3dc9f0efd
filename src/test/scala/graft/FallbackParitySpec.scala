package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, Dedup}

/** Round-9 verdict item: the distributed fallbacks behind the
  * toy/mid-scale fast lanes were never exercised through their public
  * operators (the oracle corpora are small enough to always take the
  * driver path). Both regimes must be THE SAME OPERATOR semantically,
  * so each test runs the same corpus down both paths via the
  * injectable bounds and requires identical output. */
class FallbackParitySpec extends AnyFunSuite {

  /** A corpus with real near-duplicate structure: clusters of docs
    * sharing most tokens (simhash-close, jaccard-close) plus unique
    * riff-raff. */
  private def corpus(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "machine learning models require large and carefully deduplicated training corpora",
      "completely unrelated text about cooking pasta with garlic and fresh basil leaves")
    val docs = (0 until 60).map { i =>
      val b = base(i % 3)
      val text =
        if (i < 30) b // exact repeats → tight clusters
        else if (i < 45) b + s" variant token v${i % 5}" // near dups
        else s"unique document number $i with its own words ${i * 7} ${i * 13}"
      (i.toLong, text)
    }
    docs.toDF("doc_id", "text")
  }

  test("dupClusters: distributed connectedComponents fallback equals driver union-find") {
    val spark = SparkTest.spark
    val docs = corpus(spark)
    def run(bound: Int) =
      Components.dupClustersBounded(docs, "doc_id", "text", maxDist = 3, bound)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val driverPath = run(1 << 24)
    val distributed = run(0) // any edge count overflows → connectedComponents
    assert(driverPath.nonEmpty)
    // sanity: the corpus actually produced multi-doc clusters
    assert(driverPath.groupBy(_._2).exists(_._2.size > 1))
    assert(distributed === driverPath)
  }

  test("m14 entry (ImageDedup.clusters): forced distributed components equals driver union-find") {
    val spark = SparkTest.spark
    import spark.implicits._
    // dHash-like signatures with Hamming-close clusters + loners
    val sigs = (Seq(0x0F0FL, 0x0F0EL, 0x0F0CL) ++ // chain at dist 1-2
      Seq(0xAA00L, 0xAA01L) ++ // pair
      (0 until 6).map(i => 0x1000L * (i + 3) + i)) // loners
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("img_id", "dhash")
    def run(bound: Int) =
      graft.operators.ImageDedup.clusters(sigs, maxDist = 2,
          maxDriverEdges = bound)
        .orderBy("media_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val driverPath = run(1 << 24)
    val distributed = run(0)
    assert(driverPath.nonEmpty && driverPath.groupBy(_._2).exists(_._2.size > 1))
    assert(distributed === driverPath)
  }

  test("v20 entry (Ann.nearDupClusters): forced distributed components equals driver union-find") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dim = 8
    def vec(seed: Int, jitter: Float) = Seq.tabulate(dim)(j =>
      (((seed * 31 + j * 17) % 13) - 6).toFloat / 3f + (if (j == 0) jitter else 0f))
    // near-dup families: tiny jitters of shared bases, plus loners
    val vecs = ((0 until 4).map(i => (i.toLong, vec(1, i * 0.01f))) ++
      (10 until 13).map(i => (i.toLong, vec(2, (i - 10) * 0.01f))) ++
      (20 until 24).map(i => (i.toLong, vec(i * 7 + 3, 0f))))
      .toDF("vec_id", "embedding")
    val planes = (0 until 6).map(p => graft.operators.Ann.hyperplane(p, dim))
    def run(bound: Int) =
      graft.operators.Ann.nearDupClusters(vecs, "vec_id", "embedding",
          planes, threshold = 0.95, maxDriverEdges = bound)
        .orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val driverPath = run(1 << 24)
    val distributed = run(0)
    assert(driverPath.nonEmpty && driverPath.groupBy(_._2).exists(_._2.size > 1))
    assert(distributed === driverPath)
  }

  test("t52 entry (Layout.leakFreeSplitFromPairs): forced distributed components equals driver union-find") {
    val spark = SparkTest.spark
    import spark.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (20L, 25L)).toDF("da", "db")
    def run(bound: Int) =
      graft.operators.Layout.leakFreeSplitFromPairs(ids, "doc_id", pairs,
          maxDriverEdges = bound)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val driverPath = run(1 << 24)
    val distributed = run(0)
    assert(driverPath.nonEmpty)
    assert(distributed === driverPath)
  }

  test("ngramJaccardPairs: equi-join + groupByKey degrade equals the broadcast lane") {
    val spark = SparkTest.spark
    val docs = corpus(spark)
    def run(bound: Int) =
      Dedup.ngramJaccardPairsBounded(docs, "doc_id", "text", n = 3,
          threshold = 0.5, maxBucket = Int.MaxValue, skippedAcc = None,
          maxDfBroadcast = bound)
        .orderBy("da", "db")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val broadcastLane = run(1 << 24)
    val joinLane = run(0) // df table "too big" → equi-join + groupByKey
    assert(broadcastLane.nonEmpty)
    assert(joinLane === broadcastLane)
  }
}
