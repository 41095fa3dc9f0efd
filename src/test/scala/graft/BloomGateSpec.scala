package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Urls

/** Bloom blocklist gate: every reference URL — including cosmetic
  * variants that canonicalize to it — is dropped with certainty (no
  * false negatives); disjoint clean URLs survive at ~the configured
  * false-positive rate. The bit array is deterministic (fixed hash
  * seeds, order-independent merge), so these assertions are stable.
  */
class BloomGateSpec extends AnyFunSuite {

  test("blocked URLs and their canonical variants drop; clean URLs survive") {
    val spark = SparkTest.spark
    import spark.implicits._
    val reference = ((0 until 200)
      .map(i => s"https://blocked$i.example/path/$i?utm_source=x")
      :+ null.asInstanceOf[String]) // null reference entries block nothing
      .toDF("url")
    val docs = Seq(
      (1L, "https://blocked7.example/path/7"),          // canonical form
      (2L, "HTTPS://Blocked7.EXAMPLE:443/path/7#frag"), // cosmetic variant
      (3L, "https://blocked199.example/path/199/"),     // trailing slash
      (4L, "https://clean.example/totally/fine"),
      (5L, null.asInstanceOf[String])                   // nothing to block
    ).toDF("doc_id", "url")
    val kept = Urls.bloomGate(docs, "url", reference, "url", expectedRefSize = 200L,
      fpp = 0.001)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L),
      s"blocked urls must drop, kept=$kept")
    assert(kept.contains(4L) && kept.contains(5L), s"clean/null must survive, kept=$kept")
    // false-positive sanity on a disjoint population
    val clean = (0 until 100).map(i => (i.toLong, s"https://ok$i.example/p/$i"))
      .toDF("doc_id", "url")
    val survivors = Urls.bloomGate(clean, "url", reference, "url", 200L, 0.001).count()
    assert(survivors >= 95, s"fpp=0.001 should keep ~all of 100 clean urls, kept $survivors")
  }
}
