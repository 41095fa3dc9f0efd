package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR-style importance selection: target-resembling documents must
  * outrank off-domain ones, deterministically. */
class DsirSpec extends AnyFunSuite {

  test("documents resembling the target domain score higher and get selected") {
    val spark = SparkTest.spark
    import spark.implicits._
    val target = Seq(
      (100L, "spark sql query plan optimizer join"),
      (101L, "spark shuffle partition join stage plan"),
      (102L, "sql optimizer rewrites the join plan")).toDF("doc_id", "text")
    // off-domain docs share the RAW pool's common vocabulary (frequent
    // in raw, absent from target) — the regime DSIR is built to reject
    val raw = (Seq(
      (1L, "spark sql join plan stage optimizer"), // in-domain
      (2L, "query plan join shuffle spark sql"), // in-domain
      (3L, "generic filler words item generic filler words item"), // off-domain
      (4L, "filler words item generic words filler item generic")) ++ // off-domain
      (10L until 20L).map(i => (i, "generic filler words number item")))
      .toDF("doc_id", "text")
    val out = Dsir.select(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L)._1 > out(3L)._1 && out(2L)._1 > out(4L)._1,
      s"in-domain docs must outweigh off-domain: $out")
    assert(out(1L)._2 && out(2L)._2, s"in-domain docs must be selected: $out")
    assert(!out(3L)._2 && !out(4L)._2, s"off-domain docs must not be selected: $out")
  }

  test("scores are deterministic and rows cover exactly the non-empty raw docs") {
    val spark = SparkTest.spark
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta"), (2L, ""), (3L, "delta"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    def run() = Dsir.select(raw, target, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq
    val a = run()
    assert(a === run())
    assert(a.map(_._1) === Seq(1L, 3L)) // empty and null docs have no features
    // doc 1: features alpha, beta, "alpha beta" (3 occurrences)
    assert(a.head._2 === 3L)
  }

  test("empty target degrades to uniform smoothing instead of dividing by zero") {
    val spark = SparkTest.spark
    import spark.implicits._
    val target = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val raw = Seq((1L, "some words here")).toDF("doc_id", "text")
    val out = Dsir.importanceScores(raw, target, "doc_id", "text").collect()
    assert(out.length === 1 && out.head.getLong(1) === 5L)
  }
}
