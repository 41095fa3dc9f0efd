package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Range-join edge semantics: inclusive endpoints, partition isolation,
  * each qualifying pair emitted exactly once even when the interval
  * spans many buckets, and exact parity with the naive inequality join
  * on randomized data.
  */
class RangeJoinSpec extends AnyFunSuite {

  test("inclusive bounds, partition isolation, one row per pair across buckets") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dim = Seq(
      (1L, 30L, 10L, 100L),  // spans buckets 1..10 at width 10
      (1L, 31L, 40L, 45L),
      (2L, 12L, 10L, 100L)   // same bounds, other partition
    ).toDF("k", "interval_id", "start_us", "end_us")
    val fact = Seq(
      (1L, 1L, 9L),    // just before -> no match
      (1L, 2L, 10L),   // on start (inclusive) -> 30
      (1L, 3L, 42L),   // inside both k=1 intervals -> 30 and 31
      (1L, 4L, 100L),  // on end (inclusive) -> 30
      (1L, 5L, 101L),  // just after -> no match
      (2L, 6L, 42L)    // other partition -> only 12
    ).toDF("k", "event_id", "ts_us")
    val out = RangeJoin.join(fact, dim, Seq("k"), "ts_us", "start_us", "end_us", bucketWidth = 10L)
      .select("event_id", "interval_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out === Seq((2L, 30L), (3L, 30L), (3L, 31L), (4L, 30L), (6L, 12L)))
  }

  test("bucketed rewrite reproduces the naive inequality join exactly") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rnd = new scala.util.Random(46)
    val dim = (0 until 40).map(i =>
      (rnd.nextInt(4).toLong, 100L + i, rnd.nextInt(1000).toLong))
      .map { case (k, id, s) => (k, id, s, s + rnd.nextInt(300).toLong) }
      .toDF("k", "interval_id", "start_us", "end_us")
    val fact = (0 until 200).map(i =>
      (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(1400).toLong))
      .toDF("k", "event_id", "ts_us")
    val naive = fact.as("f").join(dim.as("d"),
        $"f.k" === $"d.k" && $"f.ts_us" >= $"d.start_us" && $"f.ts_us" <= $"d.end_us")
      .select($"f.event_id", $"d.interval_id").as[(Long, Long)].collect().sorted.toSeq
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.join(fact, dim, Seq("k"), "ts_us", "start_us", "end_us", width)
        .select("event_id", "interval_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got === naive, s"width=$width must match the naive join")
    }
  }

  test("non-positive bucket width is rejected") {
    val spark = SparkTest.spark
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, 2L)).toDF("k", "id", "s", "e")
    assertThrows[IllegalArgumentException] {
      RangeJoin.join(df, df, Seq("k"), "s", "s", "e", 0L)
    }
  }
}
