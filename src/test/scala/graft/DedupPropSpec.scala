package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property checks for the near-dup pair kernels against brute-force
  * references — the filters under test (ppjoin prefix/length/positional
  * bounds, the canonical-bucket rule, the simhash pigeonhole chunking)
  * are exactly the kind of index arithmetic a unit example can pass
  * while an off-by-one silently drops pairs on other inputs. Documents
  * come from a TINY vocabulary so real near-duplicates, full
  * duplicates, subset documents and shared rare shingles all generate.
  *
  * ppjoin and the pigeonhole search are EXACT by design (their filters
  * only ever over-estimate the candidate set), so the property is
  * equality with the reference. MinHash banding is probabilistic in
  * RECALL by design, so its properties are the two sides that are not:
  * precision (every emitted pair's Jaccard is the true one, ≥ τ) and
  * the all-bands-match guarantee (identical shingle sets MUST pair).
  */
class DedupPropSpec extends AnyFunSuite {

  private def shingleSet(text: String, n: Int): Set[Long] = {
    val toks = text.trim.split("\\s+")
    (0 to toks.length - n).map { i =>
      Dedup.hash64(toks.slice(i, i + n).mkString(" "))
    }.toSet
  }

  private def bruteJaccardPairs(docs: Seq[(Long, String)], n: Int,
      threshold: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t, n) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia < ib
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= threshold
    } yield (ia, ib, jac)).toSet
  }

  private def docGen(vocab: Seq[String]): Gen[String] = for {
    len <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def corpus(nDocs: Int, seed: Long): Seq[(Long, String)] = {
    val vocab = Seq("a", "b", "c", "d", "ee", "ff")
    var s = org.scalacheck.rng.Seed(seed)
    val base = (0 until nDocs).map { i =>
      val t = docGen(vocab).apply(Gen.Parameters.default, s).get; s = s.next
      (i.toLong, t)
    }
    // guarantee exact duplicates and a near-duplicate exist
    base ++ Seq((100L, base.head._2), (101L, base.head._2 + " a"))
  }

  test("ppjoin: pair set equals the brute-force Jaccard join exactly") {
    val spark = SparkTest.spark
    import spark.implicits._
    for ((threshold, round) <- Seq(0.3, 0.5, 0.8).zipWithIndex) {
      val docs = corpus(25, seed = 400 + round)
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 2, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteJaccardPairs(docs, n = 2, threshold)
      assert(got === want, s"threshold $threshold")
    }
  }

  test("simhash pigeonhole: pair set equals brute-force Hamming search") {
    val spark = SparkTest.spark
    import spark.implicits._
    var s = org.scalacheck.rng.Seed(41L)
    for (maxDist <- Seq(1, 3); round <- 0 until 2) {
      val n = Gen.chooseNum(5, 40).apply(Gen.Parameters.default, s).get; s = s.next
      val sigs = (0 until n).map { _ =>
        val v = Gen.chooseNum(0L, 65535L).apply(Gen.Parameters.default, s).get
        s = s.next; v
      }.distinct
      val got = Dedup.simhashSigPairs(sigs.toDF("simhash"), maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        a <- sigs; b <- sigs
        if a != b
        ham = java.lang.Long.bitCount(a ^ b).toLong
        if ham <= maxDist
      } yield (a, b, ham)).toSet
      assert(got === want, s"maxDist $maxDist round $round n=${sigs.length}")
    }
  }

  test("minhash LSH: precision is exact and identical shingle sets always pair") {
    val spark = SparkTest.spark
    import spark.implicits._
    for (round <- 0 until 2) {
      val docs = corpus(20, seed = 500 + round)
      val threshold = 0.5
      val got = Dedup.minhashLshPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 2, bands = 4, rowsPerBand = 2, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteJaccardPairs(docs, n = 2, threshold)
      // precision: every emitted pair is a true pair with the true value
      assert(got.subsetOf(want), s"round $round: emitted non-pairs ${got -- want}")
      // identical shingle sets agree on every minhash row, so all bands
      // match and the pair cannot be missed
      val idByText = docs.filter(d => shingleSet(d._2, 2).nonEmpty)
        .groupBy(d => shingleSet(d._2, 2)).values.filter(_.size >= 2)
      for (dup <- idByText; Seq(x, y) <- dup.map(_._1).sorted.combinations(2))
        assert(got.exists(p => p._1 == x && p._2 == y),
          s"round $round: identical docs ($x,$y) not paired")
    }
  }
}
