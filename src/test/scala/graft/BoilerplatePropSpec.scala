package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

/** Property check for frequency-based boilerplate removal against a
  * direct single-threaded reference: random tiny-vocabulary corpora
  * (shared chunks arise naturally), several chunk sizes, thresholds
  * and tail guards, both hash widths. The t35 oracle pins one corpus
  * shape; this pins the chunk arithmetic (tail chunks, the per-doc
  * distinct frequency rule, the guard, remove-ALL-occurrences). */
class BoilerplatePropSpec extends AnyFunSuite {

  private def reference(docs: Seq[(Long, String)], k: Int, maxDf: Long,
      minTok: Int): Map[Long, (String, Long, Long)] = {
    def chunksOf(text: String): Seq[String] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      (0 until (toks.length + k - 1) / k).map(i =>
        toks.slice(i * k, math.min((i + 1) * k, toks.length)).mkString(" "))
    }
    val docFreq = docs.flatMap { case (id, t) => chunksOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    docs.map { case (id, t) =>
      val cs = chunksOf(t)
      val kept = cs.filter(c =>
        !(docFreq(c) >= maxDf && c.split(" ").length >= minTok))
      id -> ((kept.mkString(" "), cs.size.toLong, (cs.size - kept.size).toLong))
    }.toMap
  }

  test("random corpora: operator equals the reference across k, maxDf, guard, hash width") {
    val spark = SparkTest.spark
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    var seed = org.scalacheck.rng.Seed(2026L)
    for (round <- 0 until 6) {
      val texts = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, doc))
        .apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val k = 1 + round % 3
      val maxDf = 2L + round % 2
      val minTok = math.min(k, 1 + round % 2)
      val wide = round % 2 == 1
      val got = Boilerplate.remove(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, maxDf, minTok, wide)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === reference(docs, k, maxDf, minTok),
        s"round=$round k=$k maxDf=$maxDf minTok=$minTok wide=$wide docs=$docs")
    }
  }
}
