package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The standing-index UPDATE tick ([[Dedup.minhashIndexAdmit]]):
  * planted fixtures for the three verdict paths — duplicate-of-reference
  * rejected, novel doc admitted, and a later batch doc caught ONLY
  * because the admitted doc entered the index.
  */
class IndexAdmitSpec extends AnyFunSuite {

  private val N = 3
  private val Bands = 4
  private val RowsPerBand = 4
  private val Tau = 0.5

  private def docsDf(rows: (Long, String)*) = {
    val spark = SparkTest.spark
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ~20 tokens so one word changed keeps jaccard >= tau; unrelated text shares nothing
  private val refText =
    "the quick brown fox jumps over the lazy dog while seven wizards brew strong potions under a pale winter moon tonight"
  private val novelText =
    "completely different subject matter entirely about distributed query engines shuffling compact signature rows across executor boundaries every single ingest tick"
  private val novelNearDup = novelText.replace("single", "individual")
  private val unrelated =
    "third topic altogether concerning maritime navigation charts and the careful plotting of coastal depth soundings by lighthouse keepers"

  test("admit tick: dup rejected, novel admitted, next batch caught by updated index") {
    val ref = docsDf(100L -> refText, 101L -> unrelated)
    val refIndex = Dedup.minhashDocIndex(ref, "doc_id", "text", N, Bands, RowsPerBand)

    val batchA = docsDf(
      1L -> refText.replace("tonight", "tonite"), // near-dup of ref 100 → rejected
      2L -> novelText) // novel → admitted
    val adm = Dedup.minhashIndexAdmit(refIndex, batchA, "doc_id", "text",
      N, Bands, RowsPerBand, Tau)

    val dec = adm.decisions.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(dec(1L)._1 == false && dec(1L)._2 >= 1L)
    assert(dec(2L) == ((true, 0L)))

    val idx = adm.updatedIndex.select("sid").collect().map(_.getLong(0)).toSet
    assert(idx == Set(100L, 101L, 2L)) // rejected doc 1 NOT in the index

    // batch B: near-dup of the ADMITTED doc 2 — only the updated index catches it
    val batchB = docsDf(10L -> novelNearDup)
    val caughtUpdated = Dedup.minhashLshPairsAcrossIndexed(batchB, adm.updatedIndex,
      "doc_id", "text", N, Bands, RowsPerBand, Tau).collect()
    assert(caughtUpdated.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((10L, 2L)))

    val caughtFrozen = Dedup.minhashLshPairsAcrossIndexed(batchB, refIndex,
      "doc_id", "text", N, Bands, RowsPerBand, Tau).collect()
    assert(caughtFrozen.isEmpty) // the frozen index misses it — the op's reason to exist
  }

  test("admitted rows probe identically to freshly indexed text") {
    // updated-index rows for admitted docs must be bit-identical to what
    // minhashDocIndex would produce from their text directly
    val ref = docsDf(100L -> refText)
    val refIndex = Dedup.minhashDocIndex(ref, "doc_id", "text", N, Bands, RowsPerBand)
    val adm = Dedup.minhashIndexAdmit(refIndex, docsDf(2L -> novelText),
      "doc_id", "text", N, Bands, RowsPerBand, Tau)
    val fromAdmit = adm.updatedIndex.filter(col("sid") === 2L).collect()
    val direct = Dedup.minhashDocIndex(docsDf(2L -> novelText), "doc_id", "text",
      N, Bands, RowsPerBand).collect()
    assert(fromAdmit.length == 1 && direct.length == 1)
    assert(fromAdmit.head.getSeq[Long](1).toList == direct.head.getSeq[Long](1).toList)
    assert(fromAdmit.head.getSeq[Long](2).toList == direct.head.getSeq[Long](2).toList)
  }

  test("replayed sid never plants a duplicate index row (disjoint-id defense)") {
    // a batch doc carrying a sid ALREADY in the index pairs with
    // nothing (same-id guard) and so looks 'admitted' — the union must
    // still refuse the second signature row, or every later tick emits
    // duplicate band rows and duplicated pairs
    val ref = docsDf(100L -> refText, 101L -> unrelated)
    val refIndex = Dedup.minhashDocIndex(ref, "doc_id", "text", N, Bands, RowsPerBand)
    val replay = docsDf(100L -> refText, 2L -> novelText) // 100 replayed verbatim
    val adm = Dedup.minhashIndexAdmit(refIndex, replay, "doc_id", "text",
      N, Bands, RowsPerBand, Tau)
    val counts = adm.updatedIndex.groupBy(col("sid"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(100L -> 1L, 101L -> 1L, 2L -> 1L))
    // the verdict row AGREES with the refused union: the replayed sid
    // reports admitted=false (with 0 ref matches — the same-id guard
    // saw nothing), so a caller keeping "admitted" docs cannot
    // double-ingest it; the genuinely novel doc stays admitted
    val verdicts = adm.decisions.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(verdicts(100L) == ((false, 0L)), s"replayed sid verdict: $verdicts")
    assert(verdicts(2L)._1, s"novel doc must stay admitted: $verdicts")
    // and the updated index still probes cleanly: a near-dup of the
    // replayed doc matches it exactly ONCE
    val probe = Dedup.minhashLshPairsAcrossIndexed(
      docsDf(10L -> refText.replace("tonight", "tonite")), adm.updatedIndex,
      "doc_id", "text", N, Bands, RowsPerBand, Tau).collect()
    assert(probe.count(r => r.getLong(1) == 100L) == 1)
  }
}
