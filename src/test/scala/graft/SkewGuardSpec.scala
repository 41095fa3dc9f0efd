package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup}

/** The `maxBucket` skew guard on the bucketed pair kernels: a
  * mega-bucket (a template-heavy near-identical cluster landing on one
  * band hash) must be SKIPPED and COUNTED, not verified quadratically
  * inside one task — and the guard must change nothing when off (the
  * oracle queries run uncapped). */
class SkewGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  // 40 identical docs: every band of every doc shares one bucket, so the
  // symmetric kernel forms 40*39/2 pairs at jaccard 1.0 when uncapped
  private def megaCluster = (1L to 40L)
    .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
    .toDF("doc_id", "text")

  test("minhashLshPairs: cap skips the mega-bucket and counts it") {
    val uncapped = Dedup.minhashLshPairs(megaCluster, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
    assert(uncapped.count() === 40L * 39 / 2)
    val acc = spark.sparkContext.longAccumulator(Dedup.SkippedBucketsAcc)
    val capped = Dedup.minhashLshPairs(megaCluster, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5, maxBucket = 10,
      skippedAcc = Some(acc))
    assert(capped.count() === 0)
    assert(acc.value === 4) // all 4 band buckets over cap, each counted once
  }

  test("minhashLshPairsAcross: cap applies to the boundary kernel") {
    val refs = megaCluster.withColumn("doc_id", col("doc_id") + 1000)
    val uncapped = Dedup.minhashLshPairsAcross(megaCluster, refs, "doc_id",
      "text", n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
    assert(uncapped.count() === 40L * 40)
    val capped = Dedup.minhashLshPairsAcross(megaCluster, refs, "doc_id",
      "text", n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5,
      maxBucket = 10)
    assert(capped.count() === 0)
  }

  test("ngramJaccardPairs: cap applies to the ppjoin run walk") {
    val uncapped = Dedup.ngramJaccardPairs(megaCluster, "doc_id", "text",
      n = 3, threshold = 0.5)
    assert(uncapped.count() === 40L * 39 / 2)
    val acc = spark.sparkContext.longAccumulator(Dedup.SkippedBucketsAcc)
    val capped = Dedup.ngramJaccardPairs(megaCluster, "doc_id", "text",
      n = 3, threshold = 0.5, maxBucket = 10, skippedAcc = Some(acc))
    assert(capped.count() === 0)
    assert(acc.value > 0)
  }

  test("ImageDedup.nearPairs: 10k identical images cost one distinct-sig row; cap skips the family") {
    import graft.operators.ImageDedup
    // 10,000 byte-identical images collapse to ONE dHash — the crawl-scale
    // mega-family (blank thumbnails, logos). The pigeonhole kernel pairs
    // DISTINCT signatures, so in-bucket work is 3 rows here, never 10k²;
    // the family's own ham-0 pairs are governed by the family cap.
    val mega = spark.range(10000L).select(col("id").as("img_id"), lit(42L).as("dhash"))
    val near = Seq((20001L, 1024L), (20002L, 1025L)).toDF("img_id", "dhash") // ham 1
    val acc = spark.sparkContext.longAccumulator(Dedup.SkippedBucketsAcc)
    val capped = ImageDedup.nearPairs(mega.unionAll(near), maxDist = 3,
      maxBucket = 100, skippedAcc = Some(acc))
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((20001L, 20002L, 1L)))
    assert(acc.value === 1) // exactly the over-cap family; all sig buckets tiny
    // uncapped, a family yields exactly C(k,2) streamed ham-0 pairs
    val fam = spark.range(300L).select(col("id").as("img_id"), lit(7L).as("dhash"))
    assert(ImageDedup.nearPairs(fam, maxDist = 3).count() === 300L * 299 / 2)
  }

  test("lshNearDupPairs: cap applies to the vector kernel; small buckets pass") {
    val planes = Seq.tabulate(4)(p => Seq.tabulate(4)(d => if (d == p) 1f else 0f))
    // 30 identical vectors land in one bucket; 2 distinct ones elsewhere
    val vecs = ((1L to 30L).map(i => (i, Array(1f, 1f, 1f, 1f))) ++
      Seq((31L, Array(-1f, -1f, -1f, -1f)), (32L, Array(-1f, -1f, -1f, -0.9f))))
      .toDF("vec_id", "embedding")
    val uncapped = Ann.lshNearDupPairs(vecs, "vec_id", "embedding", planes, 0.5)
    assert(uncapped.count() === 30L * 29 / 2 + 1)
    val capped = Ann.lshNearDupPairs(vecs, "vec_id", "embedding", planes, 0.5,
      maxBucket = 10)
    // the mega-bucket is dropped; the 2-member bucket still verifies
    assert(capped.count() === 1)
  }
}
