package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

/** [[Boilerplate.remove]] semantics: frequency-triggered, removes ALL
  * occurrences (unlike span dedup's keep-first), short-tail guard,
  * irregular-whitespace parity, wideHash plan parity. */
class BoilerplateSpec extends AnyFunSuite {

  private def run(rows: Seq[(Long, String)], k: Int, maxDf: Long,
      minTok: Int = 2, wide: Boolean = false): Map[Long, (String, Long, Long)] = {
    val spark = SparkTest.spark
    import spark.implicits._
    Boilerplate.remove(rows.toDF("doc_id", "text"), "doc_id", "text", k, maxDf, minTok, wide)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("removes every occurrence of a high-doc-frequency chunk, including the first") {
    val banner = "subscribe to our newsletter now"
    val out = run(Seq(
      (1L, s"$banner alpha beta gamma delta epsilon"),
      (2L, s"$banner zeta eta theta iota kappa"),
      (3L, s"$banner lambda mu nu xi omicron"),
      (4L, "completely clean document with original words")), k = 5, maxDf = 3)
    assert(out(1L) === (("alpha beta gamma delta epsilon", 2L, 1L)))
    assert(out(2L) === (("zeta eta theta iota kappa", 2L, 1L)))
    assert(out(3L) === (("lambda mu nu xi omicron", 2L, 1L)))
    assert(out(4L) === (("completely clean document with original words", 2L, 0L)))
  }

  test("doc frequency is per-document: a chunk repeated inside ONE doc survives") {
    val out = run(Seq(
      (1L, "again and again again and again"),
      (2L, "other words entirely here today now")), k = 3, maxDf = 2)
    assert(out(1L)._3 === 0L)
    assert(out(2L)._3 === 0L)
  }

  test("short-tail guard: a 1-token tail chunk is never cut even at high frequency") {
    // every doc ends with the same single-token tail chunk 'order'
    val out = run(Seq(
      (1L, "alpha beta gamma order"),
      (2L, "delta epsilon zeta order"),
      (3L, "eta theta iota order")), k = 3, maxDf = 3)
    assert(out.values.forall(_._3 == 0L))
    assert(out(1L)._1 === "alpha beta gamma order")
    // with the guard off (minTok = 1) the tails are boilerplate
    val noGuard = run(Seq(
      (1L, "alpha beta gamma order"),
      (2L, "delta epsilon zeta order"),
      (3L, "eta theta iota order")), k = 3, maxDf = 3, minTok = 1)
    assert(noGuard(1L) === (("alpha beta gamma", 2L, 1L)))
  }

  test("irregular whitespace tokenizes like the hash kernel (no index shift)") {
    val out = run(Seq(
      (1L, "shared chunk text alpha"),
      (2L, "\tshared chunk text beta\n"),
      (3L, "  shared chunk text   gamma")), k = 3, maxDf = 3)
    // 'shared chunk text' is a full chunk in all three docs despite
    // leading tabs / double spaces; all occurrences cut
    assert(out(1L) === (("alpha", 2L, 1L)))
    assert(out(2L) === (("beta", 2L, 1L)))
    assert(out(3L) === (("gamma", 2L, 1L)))
  }

  test("empty, whitespace-only and NULL docs come back with zero chunks") {
    val out = run(Seq((1L, ""), (2L, "   \t"), (3L, "one two three four"),
      (4L, null.asInstanceOf[String])), k = 2, maxDf = 2)
    assert(out(1L) === (("", 0L, 0L)))
    assert(out(2L) === (("", 0L, 0L)))
    assert(out(3L) === (("one two three four", 2L, 0L)))
    assert(out(4L) === (("", 0L, 0L)))
  }

  test("null doc_id rows are filtered, not a crash (user-facing TVF convention)") {
    val spark = SparkTest.spark
    import spark.implicits._
    val docs = Seq((Option(1L), "common chunk words here today extra"),
      (Option(2L), "common chunk words here today extra"),
      (Option(3L), "common chunk words here today extra"),
      (None: Option[Long], "common chunk words here today extra"))
      .toDF("doc_id", "text")
    val out = graft.operators.Boilerplate.remove(docs, "doc_id", "text", 3, 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 2L, 3L))
    val bad = graft.operators.Boilerplate
      .badChunkHashes(docs, "doc_id", "text", 3, 3).count()
    assert(bad === 2L) // both 3-token chunks reach df 3 without the null row
  }

  test("wideHash path returns identical output") {
    val rows = (0L until 30L).map { i =>
      val base = if (i % 3 == 0) "common footer text block here today" else s"unique body $i with words ${i * 7}"
      (i, s"$base trailing token$i")
    }
    assert(run(rows, 4, 3) === run(rows, 4, 3, wide = true))
  }
}
