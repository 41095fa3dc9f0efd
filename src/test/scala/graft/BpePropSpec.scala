package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Property check: the distributed BPE trainer (dictionary reduction +
  * per-round map-side-combined pair counts + driver top-1) equals a
  * naive single-machine reference (count pairs over the word multiset,
  * merge the (count desc, pair asc) winner, repeat) on random corpora
  * over a tiny alphabet — the regime where pair-count TIES are dense,
  * pinning the tie-break determinism the way SpanDedupPropSpec pins
  * span merging. */
class BpePropSpec extends AnyFunSuite {

  /** Textbook reference trainer over a (word, count) multiset; shares
    * only [[Bpe.applyMerge]] (itself pinned by BpeSpec's examples). */
  private def refTrain(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var dict: Seq[(Seq[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString), n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- dict; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + n
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        dict = dict.map { case (syms, n) => (Bpe.applyMerge(syms, best._1, best._2), n) }
      }
    }
    out.toSeq
  }

  test("random word multisets: distributed trainer equals the reference") {
    val spark = SparkTest.spark
    import spark.implicits._
    val word = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val entry = for { w <- word; n <- Gen.chooseNum(1L, 5L) } yield (w, n)
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, entry))
    var s = org.scalacheck.rng.Seed(4212L)
    for (_ <- 0 until 6) {
      val words = corpusGen.apply(Gen.Parameters.default, s).get
        // the dictionary reduction groups duplicate words — keep the
        // reference's multiset identical by pre-merging counts
        .groupBy(_._1).map { case (w, es) => (w, es.map(_._2).sum) }.toSeq
      s = s.next
      val docs = words.zipWithIndex.map { case ((w, n), i) =>
        (i.toLong, Seq.fill(n.toInt)(w).mkString(" "))
      }.toDF("doc_id", "text")
      val got = Bpe.train(docs, "text", numMerges = 4)
      assert(got == refTrain(words, 4), s"words: $words")
    }
  }

  test("encodeWord round-trip: concatenated tokens reproduce the word under any merge table") {
    // the lossless-encoding invariant: whatever merge table is applied
    // (trained, empty, or mismatched), the tokens must concatenate back
    // to the input — a merge can only ever join adjacent symbols
    val word = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))
    val pair = for {
      x <- Gen.oneOf("a", "b", "c", "ab", "cd")
      y <- Gen.oneOf("a", "b", "d", "bc")
    } yield (x, y)
    var s = org.scalacheck.rng.Seed(910L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (_ <- 0 until 40) {
      val w = gen(word)
      val merges = (0 until gen(Gen.chooseNum(0, 5))).map(_ => gen(pair)).distinct
      val ranks = merges.zipWithIndex.toMap
      assert(Bpe.encodeWord(w, ranks).mkString == w, s"word '$w' merges $merges")
    }
  }
}
