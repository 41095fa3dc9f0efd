package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prefix

/** Distributed prefix sum checked against a sequential fold, including
  * the multi-partition offsets (more partitions than rows would leave
  * some partitions empty — those must not shift later offsets).
  */
class PrefixSpec extends AnyFunSuite {

  test("running total equals the sequential fold across many partitions") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rnd = new scala.util.Random(15)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(100).toLong))
    val expected = rows.scanLeft(0L)(_ + _._2).tail
    val got = Prefix.runningTotal(rows.toDF("k", "v"), "k", "v", "run", numPartitions = 13)
      .orderBy("k").select("run").as[Long].collect().toSeq
    assert(got === expected)
  }

  test("empty partitions do not shift offsets") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    val got = Prefix.runningTotal(rows.toDF("k", "v"), "k", "v", "run", numPartitions = 8)
      .orderBy("k").select("run").as[Long].collect().toSeq
    assert(got === Seq(10L, 30L, 60L))
  }
}
