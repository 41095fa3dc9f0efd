package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** [[Bm25.indexProfile]]: the standing index's monitoring row is
  * computed from the committed artifacts alone, matches a driver-side
  * recount of the corpus, and is invariant across build-then-append vs
  * one-shot rebuild — the df-freshness sentinel in aggregate form.
  */
class Bm25ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val initial = Seq(
    (1L, "apple banana cherry date"),
    (2L, "banana cherry date elderberry fig"),
    (3L, "apple grape melon"),
    (4L, "banana banana banana"))
  private val appended = Seq(
    (10L, "banana grape kiwi kiwi"),
    (11L, "melon date apple apple apple"))

  private def expected(docs: Seq[(Long, String)]): Seq[Long] = {
    val toks = docs.map(_._2.trim.split("\\s+").toSeq)
    val n = docs.size.toLong
    val sdl = toks.map(_.size.toLong).sum
    val df = toks.flatMap(_.distinct).groupBy(identity).map { case (_, o) => o.size.toLong }
    val pruned = df.count(d => d * Bm25.PruneDfDen >= n * Bm25.PruneDfNum).toLong
    Seq(n, sdl, df.size.toLong, df.sum, df.sum, pruned, df.max)
  }

  test("profile reads only the index dir and matches a corpus recount, append == rebuild") {
    val dir = Files.createTempDirectory("bm25prof").toString
    Bm25.buildIndex(initial.toDF("doc_id", "text"), "doc_id", "text", dir)
    Bm25.appendToIndex(spark, dir, appended.toDF("doc_id", "text"), "doc_id", "text")
    val prof = Bm25.indexProfile(spark, dir)
    assert(prof.inputFiles.nonEmpty && prof.inputFiles.forall(_.contains(dir)),
      "profile must read only committed index artifacts")
    val got = prof.collect().map(_.toSeq).toSeq
    assert(got == Seq(expected(initial ++ appended)),
      s"profile must equal the corpus recount: $got")

    val dirU = Files.createTempDirectory("bm25profU").toString
    Bm25.buildIndex((initial ++ appended).toDF("doc_id", "text"),
      "doc_id", "text", dirU)
    assert(Bm25.indexProfile(spark, dirU).collect().map(_.toSeq).toSeq == got,
      "append and rebuild must profile identically")
  }
}
