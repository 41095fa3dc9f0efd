package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Profiling}

/** Exact heavy hitters + exact discrete quantiles beyond the t45/t46
  * oracles: the Misra–Gries superset guarantee on skewed random
  * corpora, partitioning-invariance of the final exact output (the
  * intermediate summaries are order-dependent; the answer must not
  * be), quantile agreement with a literal sort, and JL projection
  * sanity (sign parity with the LSH hyperplanes, cosine preservation
  * in the mean over real-ish random vectors).
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** Zipf-ish corpus: token w0 dominates, long tail behind it. */
  private def skewed(seed: Int, nDocs: Int, vocab: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until nDocs.toLong).map { id =>
      val words = Seq.fill(20) {
        val r = rnd.nextInt(100)
        if (r < 30) "w0" else if (r < 45) "w1" else "w" + (2 + rnd.nextInt(vocab - 2))
      }
      id -> words.mkString(" ")
    }
  }

  test("heavyHitters equals the brute-force definition on skewed corpora") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val docs = skewed(seed, 200, 500).toDF("doc_id", "text")
      val k = 20
      val got = Profiling.heavyHitters(docs, "text", k)
        .select("term", "cnt").as[(String, Long)].collect().toMap
      val toks = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      val n = toks.count()
      val want = toks.groupBy("t").count()
        .filter(col("count") * k > n)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"seed=$seed")
      assert(want.contains("w0"), "fixture must actually contain a heavy hitter")
    }
  }

  test("heavyHitters output is invariant to repartitioning (summaries are not; the answer is)") {
    import spark.implicits._
    val docs = skewed(7, 300, 400).toDF("doc_id", "text")
    val base = Profiling.heavyHitters(docs, "text", 25)
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    for (parts <- Seq(1, 3, 17)) {
      val got = Profiling.heavyHitters(docs.repartition(parts), "text", 25)
        .orderBy("term").as[(String, Long, Long)].collect().toSeq
      assert(got == base, s"parts=$parts")
    }
  }

  test("Misra-Gries summary retains every item with count > len/k whatever the order") {
    val rnd = new scala.util.Random(11)
    val heavy = Seq.fill(400)("hh")
    val tail = Seq.fill(600)("t" + rnd.nextInt(300))
    for (attempt <- 1 to 3) {
      val stream = rnd.shuffle(heavy ++ tail)
      val kept = Profiling.misraGries(stream.iterator, 8).toSet
      assert(kept.contains("hh"), s"attempt=$attempt: 40% item must survive k=8")
      assert(kept.size <= 8)
    }
  }

  test("quantilesDisc matches the literal sorted-rank definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vals = Seq.fill(777)(rnd.nextInt(50).toLong)
    val df = vals.toDF("v")
    val pcts = Seq(1, 25, 50, 75, 90, 99, 100)
    val got = Profiling.quantilesDisc(df, "v", pcts)
      .as[(Int, Long)].collect().toMap
    val sorted = vals.sorted
    pcts.foreach { p =>
      val rank = (vals.size.toLong * p + 99) / 100 // ceil(p*n/100), 1-indexed
      assert(got(p) == sorted((rank - 1).toInt), s"pct=$p")
    }
  }

  test("quantilesDisc is exact on a constant column and a two-value split") {
    import spark.implicits._
    val const = Seq.fill(100)(42L).toDF("v")
    assert(Profiling.quantilesDisc(const, "v", Seq(50)).as[(Int, Long)].collect().toSeq
      == Seq((50, 42L)))
    // 99 ones + 1 hundred: p99 rank = ceil(0.99*100) = 99 -> still 1
    val split = (Seq.fill(99)(1L) :+ 100L).toDF("v")
    val q = Profiling.quantilesDisc(split, "v", Seq(99, 100)).as[(Int, Long)].collect().toMap
    assert(q(99) == 1L && q(100) == 100L)
  }

  test("null inputs: null text contributes no tokens; null values shift no quantile rank") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, null), (3L, "a b c")).toDF("doc_id", "text")
    val hh = Profiling.heavyHitters(docs, "text", 3).as[(String, Long, Long)].collect()
    assert(hh.toSeq == Seq(("a", 4L, 7L))) // n=7 tokens, only 'a' has 4*3 > 7
    val vals = Seq[java.lang.Long](1L, 2L, 3L, null, null).toDF("v")
    val q = Profiling.quantilesDisc(vals, "v", Seq(50, 100)).as[(Int, Long)].collect().toMap
    assert(q(50) == 2L && q(100) == 3L) // n=3, nulls excluded from rank and histogram
  }

  test("randomProjection values are the hyperplane dot products; signs agree with lshBucket") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Ann.randomProjection(df, "vec_id", "embedding", 64, 6)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val planes = (0 until 6).map(j => Ann.hyperplane(j, 64))
    vecs.foreach { case (id, v) =>
      val want = planes.map(p => p.zip(v).foldLeft(0.0)((a, xy) => a + xy._2.toDouble * xy._1.toDouble))
      assert(out(id).zip(want).forall { case (a, b) => a == b }, s"vec $id")
    }
    // sign bits reproduce the LSH bucket exactly
    val buckets = df.select(col("vec_id"), Ann.lshBucket(col("embedding"), planes).as("b"))
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, _) =>
      val fromProj = out(id).zipWithIndex.map { case (x, j) => if (x >= 0) 1L << j else 0L }.sum
      assert(fromProj == buckets(id), s"vec $id bucket")
    }
  }

  test("randomProjection preserves cosine on average (JL sanity at m=16)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 60L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Ann.randomProjection(df, "vec_id", "embedding", 64, 16)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val errs = for (i <- 0 until 30) yield {
      val (a, b) = (vecs(2 * i), vecs(2 * i + 1))
      val exact = cos(a._2.map(_.toDouble), b._2.map(_.toDouble))
      val approx = cos(proj(a._1), proj(b._1))
      math.abs(exact - approx)
    }
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean |cosine error| $mean too large for m=16")
  }
}
