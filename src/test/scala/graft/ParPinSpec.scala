package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Par

/** [[Par.pin]] — the size-gated multi-consumer pin (round 18): below
  * the byte ceiling it must localCheckpoint (plan truncated to an RDD
  * scan), above it it must fall back to an EVICTABLE
  * persist(MEMORY_AND_DISK) — a 100 TB corpus must never be
  * force-materialized to non-evictable executor-local storage. Values
  * must be identical on both paths.
  */
class ParPinSpec extends AnyFunSuite {

  test("pin below the ceiling localCheckpoints: plan truncated, not cached") {
    val spark = SparkTest.spark
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val pinned = Par.pin(df)
    // a localCheckpoint plans as an RDD scan (lineage truncated) and
    // registers NOTHING with the CacheManager
    assert(pinned.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      s"expected a truncated RDD plan, got:\n${pinned.queryExecution.optimizedPlan}")
    assert(pinned.storageLevel == StorageLevel.NONE)
    assert(pinned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("pin above the ceiling falls back to evictable MEMORY_AND_DISK persist") {
    val spark = SparkTest.spark
    import spark.implicits._
    val key = Par.PinLocalCheckpointMaxBytesKey
    spark.conf.set(key, "0") // force every frame over the ceiling
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      val pinned = Par.pin(df)
      // the fallback path: CacheManager entry at MEMORY_AND_DISK, plan
      // NOT truncated (lineage kept — recoverable after executor loss)
      assert(pinned.storageLevel == StorageLevel.MEMORY_AND_DISK)
      assert(!pinned.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
      // identical values on the fallback path
      assert(pinned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      pinned.unpersist(blocking = true)
    } finally spark.conf.unset(key)
  }

  test("hybridTopK is value-identical under the persist fallback") {
    val spark = SparkTest.spark
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma", Array(1.0f, 0.0f)),
      (2L, "alpha delta", Array(0.9f, 0.1f)),
      (3L, "beta epsilon", Array(0.0f, 1.0f)),
      (4L, "gamma zeta alpha", Array(0.7f, 0.7f))
    ).toDF("doc_id", "text", "vec")
    val queries = Seq(
      (1L, "alpha", Array(1.0f, 0.0f)),
      (1L, "beta", Array(1.0f, 0.0f)),
      (3L, "epsilon", Array(0.0f, 1.0f))
    ).toDF("qid", "term", "qvec")
    def run(): Seq[(Long, Long, Long, Long)] =
      graft.operators.Hybrid.hybridTopK(corpus, "doc_id", "text", "vec",
          queries, kLeg = 3, k = 3)
        .orderBy("qid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val viaCheckpoint = run()
    val key = Par.PinLocalCheckpointMaxBytesKey
    spark.conf.set(key, "0")
    val viaPersist =
      try run()
      finally {
        spark.conf.unset(key)
        spark.sharedState.cacheManager.clearCache()
      }
    assert(viaCheckpoint.nonEmpty && viaCheckpoint == viaPersist)
  }
}
