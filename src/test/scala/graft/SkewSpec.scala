package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join correctness: the whole point of the operator is that the
  * result is row-identical to the plain join while the shuffle key gains
  * a salt — checked on a deliberately skewed dataset (one hot key with
  * most of the rows), for inner and left joins, plus the guard against
  * join types that replication would corrupt.
  */
class SkewSpec extends AnyFunSuite {

  private def skewed = {
    val spark = SparkTest.spark
    import spark.implicits._
    // hot key 1 carries 90 of 100 fact rows; dim lacks key 3 (left-join case)
    val fact = ((1 to 90).map(i => (1L, i.toLong)) ++ Seq((2L, 991L), (3L, 992L))
      ++ (0 until 8).map(i => (4L + i, 1000L + i)))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (4L, "a"), (5L, "b")).toDF("k", "name")
    (fact, dim)
  }

  test("salted inner and left joins equal the plain joins row-for-row") {
    val (fact, dim) = skewed
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt).collect().map(_.toString).sorted
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), buckets = 4, joinType = jt)
        .collect().map(_.toString).sorted
      assert(salted.toSeq == plain.toSeq, s"joinType=$jt diverged")
    }
  }

  test("non-fact-preserving join types are rejected (replication would duplicate dim rows)") {
    val (fact, dim) = skewed
    for (jt <- Seq("right", "full", "full_outer"))
      assertThrows[IllegalArgumentException] {
        Skew.saltedJoin(fact, dim, Seq("k"), buckets = 4, joinType = jt)
      }
  }

  test("rowSalt spreads a hot key across buckets deterministically") {
    val (fact, _) = skewed
    val salts = fact.filter(org.apache.spark.sql.functions.col("k") === 1L)
      .select(Skew.rowSalt(fact, 4)).collect().map(_.getInt(0))
    assert(salts.forall(s => s >= 0 && s < 4))
    assert(salts.distinct.length > 1, "hot key must land in more than one bucket")
    val again = fact.filter(org.apache.spark.sql.functions.col("k") === 1L)
      .select(Skew.rowSalt(fact, 4)).collect().map(_.getInt(0))
    assert(salts.toSeq == again.toSeq, "salt must be deterministic across runs")
  }
}
