package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hybrid

/** Property pin for the RRF fusion kernel: on random ranked legs the
  * distributed fuse equals a naive in-memory reference computing
  * Σ floor(scale/(κ+rank)) per (qid, doc) and ranking by
  * (score desc, doc_id). Seeded-Gen style (the DedupPropSpec
  * discipline — no scalatest/scalacheck bridge on the classpath).
  */
class HybridPropSpec extends AnyFunSuite {

  private def naive(legs: Seq[Seq[(Long, Long, Long)]], k: Int): Seq[(Long, Long, Long, Long)] = {
    val contrib = legs.flatten.map { case (qid, doc, rank) =>
      ((qid, doc), Hybrid.RrfScale / (Hybrid.RrfKappa + rank))
    }
    contrib.groupBy(_._1).map { case ((qid, doc), cs) => (qid, doc, cs.map(_._2).sum) }
      .toSeq.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, doc, rrf) => (-rrf, doc) }
          .take(k).zipWithIndex
          .map { case ((qid, doc, rrf), i) => (qid, doc, rrf, i + 1L) }
      }.sortBy(r => (r._1, r._4))
  }

  /** One random leg: per query, a sorted subset of 20 docs ranked 1..n. */
  private def legOf(seed: Long): Seq[(Long, Long, Long)] = {
    var s = org.scalacheck.rng.Seed(seed)
    def next[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    val nq = next(Gen.chooseNum(1, 4))
    (1 to nq).flatMap { q =>
      val nd = next(Gen.chooseNum(0, 8))
      val docs = next(Gen.pick(nd, 0L until 20L)).toSeq.sorted
      docs.zipWithIndex.map { case (d, i) => (q.toLong, d, i + 1L) }
    }
  }

  test("rrfFuse equals the naive reference on random legs") {
    val spark = SparkTest.spark
    import spark.implicits._
    for (round <- 0 until 12) {
      val l1 = legOf(7000 + round)
      val l2 = legOf(8000 + round)
      val k = 1 + round % 6
      val legs = Seq(l1, l2).filter(_.nonEmpty)
      if (legs.nonEmpty) {
        val dfs = legs.map(_.toDF("qid", "doc_id", "rank"))
        val got = Hybrid.rrfFuse(dfs, k)
          .orderBy("qid", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        assert(got == naive(legs, k), s"round $round k $k")
      }
    }
  }

  test("HybridStream snapshots equal hybridTopK on seeded random corpora") {
    val spark = SparkTest.spark
    import spark.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    for (round <- 0 until 3) {
      var s = org.scalacheck.rng.Seed(4100 + round)
      def next[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
      val nDocs = 8 + round * 4
      val dim = 6
      val corpus = (0 until nDocs).map { i =>
        val len = next(Gen.chooseNum(2, 8))
        val text = (0 until len).map(_ => next(Gen.oneOf(vocab))).mkString(" ")
        val vec = Seq.fill(dim)(next(Gen.chooseNum(-5, 5)).toFloat / 3f)
        (i.toLong, text, vec)
      }
      // queries drawn from corpus docs (t48's shape: self-exclusion live)
      val queries = (0 until 3).flatMap { q =>
        val (qid, _, qvec) = corpus(q * 2)
        (0 until next(Gen.chooseNum(1, 3))).map(_ =>
          (qid, next(Gen.oneOf(vocab)), qvec))
      }
      val c = corpus.toDF("doc_id", "text", "embedding")
      val qdf = queries.toDF("qid", "term", "qvec")
      val kLeg = 3 + round
      val k = 4
      val batch = graft.operators.Hybrid
        .hybridTopK(c, "doc_id", "text", "embedding", qdf, kLeg, k)
        .orderBy("qid", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val model = graft.streaming.HybridStream.train(c, "doc_id", "text", qdf, kLeg, k)
      val snap = graft.streaming.HybridStream.topK(c, "doc_id", "text", "embedding", model)
        .collect().sortBy(x => (x.qid, x.rank))
        .map(x => (x.qid, x.docId, x.rrf, x.rank)).toSeq
      assert(snap == batch, s"round $round kLeg $kLeg")
    }
  }
}
