package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join edge semantics pinned deterministically: inclusive match
  * on the equal timestamp, null before any update, latest-wins between
  * updates, and partition isolation.
  */
class AsOfSpec extends AnyFunSuite {

  test("inclusive equal-ts match, null before first update, latest-wins") {
    val spark = SparkTest.spark
    import spark.implicits._
    def t(s: Long) = new Timestamp(s * 1000)
    val dim = Seq(
      (1L, t(100), 10.0), (1L, t(200), 20.0),
      (2L, t(150), 99.0)
    ).toDF("k", "ts", "rate")
    val fact = Seq(
      (1L, t(50), "before-any"), (1L, t(100), "equal-ts"),
      (1L, t(150), "between"), (1L, t(300), "after-last"),
      (2L, t(149), "other-part-before"), (2L, t(151), "other-part-after")
    ).toDF("k", "ts", "tag")
    val out = AsOf.joinLeft(fact, dim, Seq("k"), "ts", Seq("rate"))
      .collect().map(r => (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("before-any").isEmpty, "no update at-or-before -> null")
    assert(out("equal-ts").contains(10.0), "equal timestamp must match (inclusive)")
    assert(out("between").contains(10.0))
    assert(out("after-last").contains(20.0), "latest update wins")
    assert(out("other-part-before").isEmpty, "partitions must not leak")
    assert(out("other-part-after").contains(99.0))
  }

  test("dim value column colliding with a fact column is rejected") {
    val spark = SparkTest.spark
    import spark.implicits._
    val df = Seq((1L, new Timestamp(0), 1.0)).toDF("k", "ts", "v")
    assertThrows[IllegalArgumentException] {
      AsOf.joinLeft(df, df, Seq("k"), "ts", Seq("v"))
    }
  }
}
