package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BigramLm, Dsir}

/** Property check for the fixed-point DSIR scorer against a direct
  * single-threaded reference on random tiny-vocabulary corpora: the
  * t37 oracle pins one corpus shape; this pins the feature
  * construction (unigram + bigram occurrences), the smoothing
  * denominators, the exact integer division chain and the global-mean
  * selection rule across many random target/raw splits. */
class DsirPropSpec extends AnyFunSuite {

  private val S = BigramLm.Scale

  private def reference(raw: Seq[(Long, String)], target: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Boolean)] = {
    def feats(text: String): Seq[String] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      toks.toSeq ++ toks.indices.dropRight(1).map(i => toks(i) + " " + toks(i + 1))
    }
    val tf = target.flatMap { case (_, t) => feats(t) }
    val rf = raw.flatMap { case (id, t) => feats(t).map(id -> _) }
    val tcnt = tf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rcnt = rf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dt = math.max(tf.size.toLong + tcnt.size, 1L)
    val dr = math.max(rf.size.toLong + rcnt.size, 1L)
    val scored = rf.groupBy(_._1).map { case (id, fs) =>
      val rs = fs.map { case (_, f) =>
        val pt = ((tcnt.getOrElse(f, 0L) + 1) * S) / dt
        val pr = math.max(((rcnt(f) + 1) * S) / dr, 1L)
        pt * S / pr
      }
      id -> ((fs.size.toLong, rs.sum, rs.sum / fs.size))
    }
    if (scored.isEmpty) Map.empty
    else {
      val gmean = scored.values.map(_._3).sum / scored.size
      scored.map { case (id, (n, sum, mean)) => id -> ((n, sum, mean, mean > gmean)) }
    }
  }

  test("random corpora: scorer equals the reference across target/raw splits") {
    val spark = SparkTest.spark
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "cc", "dd")
    val doc = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    var seed = org.scalacheck.rng.Seed(4242L)
    for (round <- 0 until 6) {
      val texts = Gen.chooseNum(4, 14).flatMap(n => Gen.listOfN(n, doc))
        .apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val mod = 3 + round % 3
      val (target, raw) = docs.partition(_._1 % mod == 0)
      val got = Dsir.select(raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
        "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
      assert(got === reference(raw, target), s"round=$round mod=$mod docs=$docs")
    }
  }
}
