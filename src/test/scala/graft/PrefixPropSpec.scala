package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Prefix}

/** Property check for the round-6 shuffle-free prefix-sum phases
  * (narrow partition sums + partition-local typed pass): random frames
  * against a driver-side sorted fold, over random partition counts
  * (empty partitions included by construction), duplicate group keys,
  * NULL group values, and int-typed value columns — the regime where
  * the offset bookkeeping and the group-reset rule are exercised hard.
  */
class PrefixPropSpec extends AnyFunSuite {

  test("random frames: runningTotal equals the sequential fold") {
    val spark = SparkTest.spark
    import spark.implicits._
    val entry = for {
      v <- Gen.chooseNum(-50L, 100L)
    } yield v
    var s = org.scalacheck.rng.Seed(777L)
    for (round <- 0 until 6) {
      val nGen = Gen.chooseNum(0, 120)
      val n = nGen.apply(Gen.Parameters.default, s).get; s = s.next
      val vs = Gen.listOfN(n, entry).apply(Gen.Parameters.default, s).get; s = s.next
      val parts = Gen.chooseNum(1, 17).apply(Gen.Parameters.default, s).get; s = s.next
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val expected = rows.scanLeft(0L)(_ + _._2).tail
      val (df, total) = Prefix.runningTotalAndSum(
        rows.toDF("k", "v"), Seq("k"), "v", "run", parts)
      val got = df.orderBy("k").select("run").as[Long].collect().toSeq
      assert(got === expected, s"round $round parts $parts rows $rows")
      assert(total === vs.sum)
    }
  }

  test("random frames: groupRunningTotals equals the per-group fold (null groups, int values)") {
    val spark = SparkTest.spark
    import spark.implicits._
    val entry = for {
      g <- Gen.oneOf(Some("a"), Some("b"), Some("c"), None)
      v <- Gen.chooseNum(0, 9)
    } yield (g, v)
    var s = org.scalacheck.rng.Seed(778L)
    for (round <- 0 until 6) {
      val n = Gen.chooseNum(0, 100).apply(Gen.Parameters.default, s).get; s = s.next
      val es = Gen.listOfN(n, entry).apply(Gen.Parameters.default, s).get; s = s.next
      val parts = Gen.chooseNum(1, 11).apply(Gen.Parameters.default, s).get; s = s.next
      val rows = es.zipWithIndex.map { case ((g, v), i) => (g.orNull, i.toLong, v) }
      // reference: per-group running totals in key order
      val expected = rows
        .groupBy(_._1).view.mapValues { grp =>
          val sorted = grp.sortBy(_._2)
          sorted.map(_._2).zip(sorted.scanLeft(0L)(_ + _._3).tail)
        }
        .values.flatten.toMap
      val got = Layout.groupRunningTotals(
        rows.toDF("g", "k", "v"), "g", Seq("k"), "v", "cum", parts)
        .select(col("k"), col("cum"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"round $round parts $parts rows $rows")
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
