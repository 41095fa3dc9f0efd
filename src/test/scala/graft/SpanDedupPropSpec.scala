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

  /** Reference for [[SpanDedup.cutSpans]]: keep the first (doc, pos)
    * occurrence of each window content corpus-wide; every later
    * occurrence covers positions [pos, pos+w-1]; kept tokens rejoin
    * with single spaces. */
  private def cutReference(docs: Seq[(Long, String)], w: Int): Seq[(Long, String, Long)] = {
    val windows = for {
      (id, text) <- docs
      toks = text.trim.split("\\s+")
      i <- 0 to toks.length - w
    } yield (id, i + 1, toks.slice(i, i + w).mkString(" "))
    val firstOf = windows.groupBy(_._3).view
      .mapValues(_.map(r => (r._1, r._2)).min).toMap
    val covered = windows
      .filter(r => firstOf(r._3) != ((r._1, r._2)))
      .flatMap(r => (r._2 until r._2 + w).map(p => (r._1, p)))
      .toSet
    docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !covered((id, i + 1)) => t
      }
      (id, kept.mkString(" "), covered.count(_._1 == id).toLong)
    }
  }

  test("random corpora: cutSpans equals the keep-first reference, both hash widths") {
    val spark = SparkTest.spark
    import spark.implicits._
    val vocab = Seq("a", "b", "c")
    // Separators include tabs, newlines and runs of spaces, and docs may
    // carry leading/trailing irregular whitespace: the apply-side
    // tokenization must index exactly like Dedup.wsTokens (the round-9
    // ADVICE bug — a leading tab shifted every cut index by one).
    val seps = Seq(" ", "  ", "\t", "\n", " \t ")
    var s = org.scalacheck.rng.Seed(77L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 6; w <- Seq(2, 3)) {
      val docs = (0 until gen(Gen.chooseNum(2, 10))).map { i =>
        val len = gen(Gen.chooseNum(0, 14))
        val toks = (0 until len).map(_ => gen(Gen.oneOf(vocab)))
        val body = if (toks.isEmpty) "" else
          toks.tail.foldLeft(new StringBuilder(toks.head)) { (sb, t) =>
            sb.append(gen(Gen.oneOf(seps))).append(t)
          }.toString
        val lead = gen(Gen.oneOf("", "\t", " ", "\n "))
        val tail = gen(Gen.oneOf("", "\n", " ", " \t"))
        (i.toLong, lead + body + tail)
      }
      val wide = round % 2 == 1
      val got = SpanDedup.cutSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w,
          wideHash = wide)
        .orderBy("doc_id")
        .as[(Long, String, Long)].collect().toSeq
      val want = cutReference(docs, w).sortBy(_._1)
      assert(got === want, s"round $round w=$w wide=$wide docs=$docs")
    }
    // The exact ADVICE reproduction: [(1,'a b'), (2,'\ta b x\n')], w=2 —
    // doc 2's 'a b' is the later occurrence, so 'a b' is cut and 'x' kept.
    val fixed = Seq((1L, "a b"), (2L, "\ta b x\n"))
    val got = SpanDedup.cutSpans(fixed.toDF("doc_id", "text"), "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a b", 0L), (2L, "x", 2L)))
  }

  test("random corpora: ngramContamination equals the naive overlap count") {
    val spark = SparkTest.spark
    import spark.implicits._
    val vocab = Seq("a", "b", "c")
    var s = org.scalacheck.rng.Seed(99L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    def mkDocs(n: Int, base: Long) = (0 until n).map { i =>
      (base + i, (0 until gen(Gen.chooseNum(0, 12))).map(_ => gen(Gen.oneOf(vocab))).mkString(" "))
    }
    def wins(text: String, w: Int): Seq[String] = {
      val toks = text.trim.split("\\s+")
      (0 to toks.length - w).map(i => toks.slice(i, i + w).mkString(" "))
    }
    for (round <- 0 until 4; w <- Seq(2, 3)) {
      val train = mkDocs(gen(Gen.chooseNum(1, 8)), 0L)
      val eval = mkDocs(gen(Gen.chooseNum(1, 3)), 100L)
      val evalSet = eval.flatMap(d => wins(d._2, w)).toSet
      val want = train.flatMap { case (id, text) =>
        val hits = wins(text, w).filter(evalSet)
        if (hits.isEmpty) None
        else Some((id, hits.distinct.size.toLong, hits.size.toLong))
      }.sortBy(_._1)
      val wide = round % 2 == 1
      val got = SpanDedup.ngramContamination(
          train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"), "doc_id", "text", w,
          wideHash = wide)
        .orderBy("doc_id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === want, s"round $round w=$w wide=$wide train=$train eval=$eval")
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
