package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{CodecExpressions, TextFunctions}

/** The NFC expression + normalization chain beyond the t42 oracle:
  * composition vectors (spelled as explicit codepoints — invisible
  * composition differences in source literals would test nothing),
  * null safety, SQL registration, and codegen participation.
  */
class NormalizeSpec extends AnyFunSuite {

  private val EAcute = "\u00e9"            // precomposed é
  private val EDecomposed = "\u0065\u0301"      // e + COMBINING ACUTE
  private val ARing = "\u00c5"             // precomposed Å
  private val ADecomposed = "\u0041\u030a"      // A + COMBINING RING
  private val Angstrom = "\u212b"          // ANGSTROM SIGN (NFC -> U+00C5)

  private def nfcOf(s: String): String = {
    val spark = SparkTest.spark
    import spark.implicits._
    Seq(s).toDF("t").select(CodecExpressions.nfc_normalize(col("t")))
      .collect().head.getString(0)
  }

  test("nfc_normalize composes decomposed sequences and keeps composed ones") {
    assert(nfcOf("caf" + EDecomposed) === "caf" + EAcute)
    assert(nfcOf("caf" + EAcute) === "caf" + EAcute)
    assert(nfcOf(ADecomposed) === ARing)
    assert(nfcOf(Angstrom) === ARing)
    // Hangul Jamo compose to one precomposed syllable (U+AC00)
    assert(nfcOf("\u1100\u1161") === "\uac00")
  }

  test("nfc_normalize is null-safe and registered for SQL") {
    val spark = SparkTest.spark
    import spark.implicits._
    graft.sources.SqlFrontDoor.register(spark)
    val out = Seq(Some(EDecomposed), None).toDF("t")
      .selectExpr("nfc_normalize(t) AS n").collect()
    assert(out(0).getString(0) === EAcute)
    assert(out(1).isNullAt(0))
  }

  test("the chain strips controls, collapses whitespace and trims") {
    val spark = SparkTest.spark
    import spark.implicits._
    val out = Seq("  ab   c\t d  ").toDF("t")
      .select(TextFunctions.normalizeText(col("t"))).collect().head.getString(0)
    assert(out === "ab c d")
  }

  test("normalizeText stays inside whole-stage codegen") {
    val spark = SparkTest.spark
    // a local Seq would constant-fold to a LocalRelation with no codegen
    // at all — use a range scan so the projection actually plans
    val df = spark.range(4)
      .select(concat(lit("x "), col("id").cast("string")).as("t"))
      .select(TextFunctions.normalizeText(col("t")).as("n"))
    // the `*(n)` prefix is the WholeStageCodegen marker in the compact
    // plan rendering — the projection containing nfc_normalize must
    // carry it (a non-codegen expression would break the span)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("Project") && l.trim.startsWith("*(") && l.contains("nfc_normalize")),
      s"nfc_normalize projection not inside a codegen span:\n$plan")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("x 0", "x 1", "x 2", "x 3"))
  }
}
