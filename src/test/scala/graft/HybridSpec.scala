package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hybrid

/** Hybrid-retrieval RRF fusion: hand-computed fixtures for the integer
  * rank-fusion arithmetic, the self-exclusion re-rank, and the
  * end-to-end two-leg composition.
  */
class HybridSpec extends AnyFunSuite {

  test("rrfFuse: hand-computed integer fusion of two legs") {
    val spark = SparkTest.spark
    import spark.implicits._
    // leg1 ranks docs 10, 11; leg2 ranks 11, 12 — 11 gets both contributions
    val leg1 = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "doc_id", "rank")
    val leg2 = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("qid", "doc_id", "rank")
    val out = Hybrid.rrfFuse(Seq(leg1, leg2), k = 10)
      .orderBy(col("rank")).collect()
    val c1 = Hybrid.RrfScale / (Hybrid.RrfKappa + 1) // floor(1e9/61)
    val c2 = Hybrid.RrfScale / (Hybrid.RrfKappa + 2) // floor(1e9/62)
    assert(c1 == 16393442L && c2 == 16129032L)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq == Seq(
      (1L, 11L, c1 + c2, 1L), // both legs
      (1L, 10L, c1, 2L), // leg1 rank 1
      (1L, 12L, c2, 3L))) // leg2 rank 2
  }

  test("rrfFuse ties break by doc_id ascending") {
    val spark = SparkTest.spark
    import spark.implicits._
    val leg = Seq((7L, 5L, 1L), (7L, 3L, 1L)).toDF("qid", "doc_id", "rank")
    // same rank in two legs → same rrf; doc 3 must outrank doc 5
    val out = Hybrid.rrfFuse(Seq(leg), k = 10).orderBy(col("rank")).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 5L))
  }

  test("dropSelf removes the query doc and closes the rank gap") {
    val spark = SparkTest.spark
    import spark.implicits._
    val leg = Seq(
      (1L, 9L, 100L, 1L), (1L, 1L, 90L, 2L), (1L, 4L, 80L, 3L),
      (2L, 5L, 70L, 1L), (2L, 6L, 60L, 2L), (2L, 7L, 50L, 3L))
      .toDF("qid", "doc_id", "score", "rank")
    val out = Hybrid.dropSelf(leg, kLeg = 2)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // qid 1: self row (doc 1) dropped, doc 4 closes up to rank 2;
    // qid 2: no self row, rank 3 trimmed by kLeg
    assert(out == Set((1L, 9L, 1L), (1L, 4L, 2L), (2L, 5L, 1L), (2L, 6L, 2L)))
  }

  test("hybridTopK: lexical-only and vector-only matches both surface; overlap outranks") {
    val spark = SparkTest.spark
    import spark.implicits._
    // doc 0 is the query. doc 1: same text AND same vector (should fuse
    // to rank 1). doc 2: same text, orthogonal vector. doc 3: junk text,
    // same vector. doc 4: junk text, orthogonal vector (never retrieved
    // by the vector leg at k=2... still ranked by bm25 as 0-score? no —
    // batchTopK only scores docs containing a query term, so 4 is absent
    // from the lexical leg too unless it shares a term).
    val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val o = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", v),
      (1L, "alpha beta gamma delta epsilon zeta eta theta", v),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", o),
      (3L, "junk words only here nothing shared at all", v),
      (4L, "other filler text with zero overlap too yes", o))
      .toDF("doc_id", "text", "embedding")
    val queries = Seq(
      (0L, "alpha", v), (0L, "gamma", v), (0L, "epsilon", v))
      .toDF("qid", "term", "qvec")
    val out = Hybrid.hybridTopK(corpus, "doc_id", "text", "embedding",
        queries, kLeg = 3, k = 4)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // doc 1 fuses lexical rank 1 (tie with 2, id-break) + vector rank 1
    assert(out.head == (1L, 1L))
    val docs = out.map(_._1).toSet
    assert(docs.contains(2L)) // lexical-only
    assert(docs.contains(3L)) // vector-only
    assert(!docs.contains(0L)) // self excluded from both legs
  }
}
