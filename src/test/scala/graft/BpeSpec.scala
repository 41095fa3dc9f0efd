package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE trainer against the textbook word-count example:
  * hug×10, pug×5, pun×12, bun×4, hugs×5 →
  *   round 1 pairs: (u,g)=20, (p,u)=17, (u,n)=16, (h,u)=15, (g,s)=5, (b,u)=4
  *     → merge (u,g); "ug" absorbs the u of hug/pug/hugs, so round 2 is
  *   (u,n)=16 [pun+bun], (h,ug)=15, (p,u)=12 [pun only], (p,ug)=5, ...
  *     → merge (u,n), then (h,ug)=15 wins round 3.
  */
class BpeSpec extends AnyFunSuite {

  private def corpus = {
    val spark = SparkTest.spark
    import spark.implicits._
    val words = Seq("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    // one doc per word, the word repeated count times — occurrence
    // weighting equals the dictionary weighting
    words.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, Seq.fill(n)(w).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("train produces the textbook merge sequence") {
    assert(Bpe.train(corpus, "text", 3) == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("topPairs ranks round-1 statistics with deterministic ties") {
    val rows = Bpe.topPairs(corpus, "text", 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("u", "g", 20L), ("p", "u", 17L), ("u", "n", 16L)))
  }

  test("train stops early when no pairs remain") {
    val spark = SparkTest.spark
    import spark.implicits._
    val single = Seq((1L, "a b c")).toDF("doc_id", "text")
    // all words are single symbols after 0 merges → no pairs at all
    assert(Bpe.train(single, "text", 5) == Seq.empty)
  }

  test("encode applies the trained merges in rank order per word") {
    val spark = SparkTest.spark
    import spark.implicits._
    val merges = Bpe.train(corpus, "text", 3) // (u,g), (u,n), (h,ug)
    val docs = Seq((1L, "hugs pun bug")).toDF("doc_id", "text")
    val row = Bpe.encode(docs, "doc_id", "text", merges).collect().head
    assert(row.getSeq[String](1) == Seq("hug", "s", "p", "un", "b", "ug"))
    assert(row.getLong(2) == 6L)
    // symbols concatenate back to the original words
    assert(row.getSeq[String](1).mkString == "hugspunbug")
  }

  test("sourceMixBpe budgets in trained-tokenizer symbols, not whitespace tokens") {
    val spark = SparkTest.spark
    import spark.implicits._
    val merges = Bpe.train(corpus, "text", 3) // (u,g), (u,n), (h,ug)
    // "hug hug" costs 2 BPE symbols; "bugs bugs" costs 2*3 = 6
    // ("b","ug","s"); whitespace would price both at 2 tokens
    val docs = Seq(
      (1L, "hug hug", "a"),
      (2L, "bugs bugs", "b")
    ).toDF("doc_id", "text", "source")
    val kept = graft.operators.Layout.sourceMixBpe(docs, "doc_id", "text", "source",
      tokenBudget = 4L, merges)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 2L), s"6-symbol doc must overflow a 4-symbol budget: $kept")
  }

  test("priority encodeWord equals rank-sequential application on trained merges") {
    val spark = SparkTest.spark
    import spark.implicits._
    // train a deeper merge list on a denser corpus, then check the two
    // application orders agree on random words over the same alphabet
    val words = Seq("hug", "pug", "pun", "bun", "hugs", "bug", "hub", "nub")
    val corpus = words.zipWithIndex.map { case (w, i) =>
      (i.toLong, Seq.fill(3 + i % 5)(w).mkString(" "))
    }.toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", 6)
    val ranks = Bpe.rankTable(merges)
    def sequential(w: String): Seq[String] = {
      var syms: Seq[String] = Seq.tabulate(w.length)(i => w.substring(i, i + 1))
      merges.foreach { case (a, b) => syms = Bpe.applyMerge(syms, a, b) }
      syms
    }
    val gen = org.scalacheck.Gen.chooseNum(0, 8).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf("h", "u", "g", "p", "n", "b", "s"))
        .map(_.mkString))
    var seed = org.scalacheck.rng.Seed(7L)
    for (_ <- 0 until 200) {
      val w = gen.apply(org.scalacheck.Gen.Parameters.default, seed).get
      seed = seed.next
      assert(Bpe.encodeWord(w, ranks) == sequential(w), s"word: '$w' merges: $merges")
    }
  }

  test("applyMerge is greedy left-to-right") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("h", "u", "g", "s"), "u", "g") == Seq("h", "ug", "s"))
  }
}
