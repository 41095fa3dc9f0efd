package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, RangeJoin}

/** Property checks for the composed join operators against naive
  * references: the as-of window composition (equal-timestamp
  * inclusivity, dim-before-fact ordering, facts with no prior dim) and
  * the range-join bucketing rewrite (intervals spanning many buckets,
  * zero-width intervals, boundary landings, NEGATIVE coordinates —
  * where floor-division arithmetic classically goes wrong). The q45/q46
  * oracles pin one data shape; these pin the corners. */
class JoinPropSpec extends AnyFunSuite {

  test("as-of join equals the per-fact latest-dim-at-or-before reference") {
    val spark = SparkTest.spark
    import spark.implicits._
    var s = org.scalacheck.rng.Seed(21L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 4) {
      val nFact = gen(Gen.chooseNum(1, 40))
      val facts = (0 until nFact).map { i =>
        (i.toLong, gen(Gen.chooseNum(0L, 4L)), gen(Gen.chooseNum(-5L, 20L)))
      }
      // dim rows unique per (user, ts) — the operator's contract
      val dims = (for {
        u <- 0L to 4L
        t <- -5L to 20L
        if gen(Gen.prob(0.15))
      } yield (u, t, gen(Gen.chooseNum(0L, 99L)))).toSeq
      val got = AsOf.joinLeft(
          facts.toDF("event_id", "user_id", "ts"),
          dims.toDF("user_id", "ts", "rate"),
          Seq("user_id"), "ts", Seq("rate"))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      val want = facts.map { case (id, u, t) =>
        val prior = dims.filter(d => d._1 == u && d._2 <= t)
        id -> prior.sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got === want, s"round $round")
    }
  }

  test("range join equals the naive containment join, negative coords included") {
    val spark = SparkTest.spark
    import spark.implicits._
    var s = org.scalacheck.rng.Seed(31L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 4; width <- Seq(3L, 7L)) {
      val facts = (0 until gen(Gen.chooseNum(1, 30))).map { i =>
        (i.toLong, gen(Gen.chooseNum(0L, 2L)), gen(Gen.chooseNum(-20L, 20L)))
      }
      val dims = (0 until gen(Gen.chooseNum(1, 12))).map { i =>
        val start = gen(Gen.chooseNum(-20L, 20L))
        // zero-width, sub-bucket and multi-bucket intervals all generate
        (1000L + i, gen(Gen.chooseNum(0L, 2L)), start, start + gen(Gen.chooseNum(0L, 15L)))
      }
      val got = RangeJoin.join(
          facts.toDF("event_id", "user_id", "ts_us"),
          dims.toDF("interval_id", "user_id", "start_us", "end_us"),
          Seq("user_id"), "ts_us", "start_us", "end_us", bucketWidth = width)
        .select("event_id", "interval_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (fid, fu, ft) <- facts
        (iid, du, st, en) <- dims
        if fu == du && ft >= st && ft <= en
      } yield (fid, iid)).toSet
      assert(got === want, s"round $round width $width")
    }
  }
}
