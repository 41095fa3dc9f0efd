package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

/** Property check: the distributed span-dedup pipeline (hash groupBy +
  * equi-join + island windows) equals a naive single-machine reference
  * (count window strings across the corpus, mark ≥2-count positions,
  * merge islands) on random corpora over a tiny alphabet — the regime
  * where collisions of CONTENT (not hashes) are dense and island
  * merging is exercised hard.
  */
class SpanDedupPropSpec extends AnyFunSuite {

  private val W = 3

  private def reference(corpus: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val wins = corpus.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+")
      (0 to toks.length - W).map(i => (id, i + 1, toks.slice(i, i + W).mkString(" ")))
    }
    val freq = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = wins.filter(w => freq(w._3) >= 2)
    dup.groupBy(_._1).flatMap { case (id, occs) =>
      val ps = occs.map(_._2).sorted
      val spans = ps.foldLeft(List.empty[(Int, Int, Int)]) {
        case (acc @ ((s, e, n) :: rest), p) if p - e <= W => (s, p, n + 1) :: rest
        case (acc, p) => (p, p, 1) :: acc
      }
      spans.map { case (s, e, n) =>
        val end = e + W - 1
        (id, s.toLong, end.toLong, (end - s + 1).toLong, n.toLong)
      }
    }.toSet
  }

  test("random corpora: pipeline equals the naive reference") {
    val spark = SparkTest.spark
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val seed = org.scalacheck.rng.Seed(42L)
    var s = seed
    for (_ <- 0 until 8) {
      val corpus = corpusGen.apply(Gen.Parameters.default, s).get
      s = s.next
      val got = SpanDedup.dupSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", W)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === reference(corpus), s"corpus: $corpus")
    }
  }

  test("random corpora: 64-bit and 128-bit identities agree") {
    val spark = SparkTest.spark
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    var s = org.scalacheck.rng.Seed(4242L)
    for (_ <- 0 until 5) {
      val corpus = corpusGen.apply(Gen.Parameters.default, s).get
      s = s.next
      val df = corpus.toDF("doc_id", "text")
      val narrow = SpanDedup.dupSpans(df, "doc_id", "text", W)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val wide = SpanDedup.dupSpans(df, "doc_id", "text", W, wideHash = true)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(narrow === wide, s"corpus: $corpus")
    }
  }
}
