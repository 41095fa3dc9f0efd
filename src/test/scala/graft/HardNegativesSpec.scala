package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Hard-negative mining: label exclusion and exact ranking. */
class HardNegativesSpec extends AnyFunSuite {

  test("negatives never share the query's label and rank by cosine among the rest") {
    val spark = SparkTest.spark
    import spark.implicits._
    def vec(seed: Int): Seq[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hn_$seed".getBytes("UTF-8"))
      (0 until 8).map(j => ((md(j) & 0xff) - 128) / 128.0f)
    }
    val rows = (0 until 40).map(i => (i.toLong, vec(i), i % 4))
    val corpus = rows.toDF("cid", "cvec", "clabel")
    val queries = rows.take(3).map { case (id, v, l) => (id, v, l) }
      .toDF("qid", "qvec", "qlabel")
    val got = Ann.hardNegatives(corpus, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val labels = rows.map(t => t._1 -> t._3).toMap
    val vecs = rows.map(t => t._1 -> t._2.toArray).toMap
    got.foreach { case (qid, _, cid, _) =>
      assert(labels(cid) != labels(qid), s"negative $cid shares label with query $qid")
    }
    // exact parity with an in-memory reference ranking
    for (q <- 0L until 3L) {
      val expected = rows.filter(t => t._1 != q && t._3 != labels(q))
        .map(t => (t._1, Ann.cosineD(vecs(q), vecs(t._1))))
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(5).map(_._1)
      val mine = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(mine === expected, s"query $q ranking mismatch")
    }
  }
}
