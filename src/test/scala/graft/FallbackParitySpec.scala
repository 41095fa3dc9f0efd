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
