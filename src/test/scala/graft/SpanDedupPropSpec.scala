package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

/** Property check for the exact-substring span dedup against a direct
  * single-threaded reference: random tiny-vocabulary corpora (repeated
  * windows, within-document repeats and cross-document duplicates all
  * generate), both hash widths, several window sizes and count
  * thresholds. The t17 oracle pins one corpus shape; this pins the
  * island-merge arithmetic (1-based inclusive positions, the ≤ w gap
  * rule, spans touching document edges, whole-document spans). */
class SpanDedupPropSpec extends AnyFunSuite {

  /** Reference: window text occurrences counted corpus-wide (including
    * multiple positions within one document), duplicated positions
    * merged per document while successive positions are ≤ w apart. */
  private def reference(docs: Seq[(Long, String)], w: Int,
      minCount: Long): Set[(Long, Int, Int, Int, Long)] = {
    val windows = for {
      (id, text) <- docs
      toks = text.trim.split("\\s+")
      i <- 0 to toks.length - w
    } yield (id, i + 1, toks.slice(i, i + w).mkString(" "))
    val freq = windows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    windows.filter(r => freq(r._3) >= minCount)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .flatMap { case (id, positions) =>
        val spans = scala.collection.mutable.ArrayBuffer.empty[List[Int]]
        for (p <- positions) {
          if (spans.nonEmpty && p - spans.last.head <= w)
            spans(spans.length - 1) = p :: spans.last
          else spans += List(p)
        }
        spans.map { ps =>
          val sorted = ps.reverse
          (id, sorted.head, sorted.last + w - 1,
            sorted.last + w - 1 - sorted.head + 1, sorted.size.toLong)
        }
      }.toSet
  }

  test("random corpora: distributed spans equal the reference, both hash widths") {
    val spark = SparkTest.spark
    import spark.implicits._
    val vocab = Seq("a", "b", "c")
    var s = org.scalacheck.rng.Seed(61L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 3; w <- Seq(2, 3); minCount <- Seq(2L, 3L)) {
      val docs = (0 until gen(Gen.chooseNum(2, 12))).map { i =>
        val len = gen(Gen.chooseNum(0, 14))
        (i.toLong, (0 until len).map(_ => gen(Gen.oneOf(vocab))).mkString(" "))
      }
      val wide = round == 0
      val got = SpanDedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          w, minCount, wideHash = wide)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt,
          r.getLong(3).toInt, r.getLong(4)))
        .toSet
      val want = reference(docs, w, minCount)
      assert(got === want, s"round $round w=$w minCount=$minCount wide=$wide docs=$docs")
    }
  }

  test("random corpora: 64-bit and 128-bit identities agree") {
    val spark = SparkTest.spark
    import spark.implicits._
    val vocab = Seq("a", "b", "c")
    var s = org.scalacheck.rng.Seed(4242L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 5) {
      val docs = (0 until gen(Gen.chooseNum(1, 6))).map { i =>
        (i.toLong, (0 until gen(Gen.chooseNum(0, 10))).map(_ => gen(Gen.oneOf(vocab))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val narrow = SpanDedup.dupSpans(df, "doc_id", "text", 3)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val wide = SpanDedup.dupSpans(df, "doc_id", "text", 3, wideHash = true)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(narrow === wide, s"round $round docs $docs")
    }
  }
}
