package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** [[Layout.epochUpsample]]: exact copy counts, deterministic
  * fractional gate, exclusion, and the default weight. */
class EpochUpsampleSpec extends AnyFunSuite {

  private def docs(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
  }

  test("integral epochs replicate exactly; zero excludes; default covers the rest") {
    val spark = SparkTest.spark
    val out = Layout.epochUpsample(docs(spark), "doc_id", "source",
      Map("src0" -> 300, "src1" -> 0), defaultPct = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource("src0") === 300) // 100 docs x 3 copies
    assert(!bySource.contains("src1"))
    assert(bySource("src2") === 100 && bySource("src3") === 100)
    // copy numbers are 1..n per doc
    assert(out.filter(_._2 == "src0").groupBy(_._1)
      .forall { case (_, cs) => cs.map(_._3).sorted.sameElements(Seq(1L, 2L, 3L)) })
  }

  test("fractional epochs gate deterministically and close to the target rate") {
    val spark = SparkTest.spark
    def run() = Layout.epochUpsample(docs(spark), "doc_id", "source",
      Map("src0" -> 250), defaultPct = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(identity).toSeq
    val a = run()
    assert(a === run()) // bit-stable across runs
    val perDoc = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perDoc.values.forall(n => n == 2 || n == 3))
    val extra = perDoc.values.count(_ == 3)
    // md5 gate at 50% over 100 docs: binomial, allow a wide band
    assert(extra > 30 && extra < 70, s"gate rate off: $extra/100")
  }

  test("down-sampling below one epoch keeps a strict deterministic subset") {
    val spark = SparkTest.spark
    val out = Layout.epochUpsample(docs(spark), "doc_id", "source",
      Map(), defaultPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.forall(_._2 == 1L))
    assert(out.length > 400 * 40 / 100 && out.length < 400 * 80 / 100)
  }
}
