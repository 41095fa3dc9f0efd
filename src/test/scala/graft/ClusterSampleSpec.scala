package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemDedup

/** Cluster-balanced subset selection ([[SemDedup.clusterSample]]):
  * quota enforcement, totality, and the scale claim — a mega-cluster
  * contributes at most `quota` selected rows however large it grows.
  */
class ClusterSampleSpec extends AnyFunSuite {

  test("mega-cluster capped at quota; small cluster fully selected") {
    val spark = SparkTest.spark
    import spark.implicits._
    // axis-aligned clusters: 50 vectors near +x, 3 near +y
    val rows = (0 until 50).map(i => (i.toLong, Seq(1.0f, 0.001f * i, 0f, 0f))) ++
      (50 until 53).map(i => (i.toLong, Seq(0.001f * (i - 50), 1.0f, 0f, 0f)))
    val vecs = rows.toDF("vec_id", "embedding")
    // seeds = lowest-id 2 vectors: ids 0 (x-cluster), 1 (also x!) —
    // use explicit centroids instead so the two clusters separate
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val out = SemDedup.clusterSampleWithCentroids(vecs, "vec_id", "embedding",
      cents, quota = 5)
    assert(out.count() == 53) // one verdict row per input
    val sel = out.filter(col("selected")).groupBy(col("cluster_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel(0L) == 5L) // 50-vector cluster capped at quota
    assert(sel(1L) == 3L) // 3-vector cluster fully selected
    // ranks are a permutation of 1..n within each cluster
    val ranks0 = out.filter(col("cluster_id") === 0L)
      .select("cluster_rank").collect().map(_.getLong(0)).sorted
    assert(ranks0.toSeq == (1L to 50L))
  }

  test("selection is deterministic and partition-independent") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rows = (0 until 40).map(i => (i.toLong, Seq(1.0f + 0.01f * i, 0.5f, 0f, 0f)))
    val a = SemDedup.clusterSample(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", numClusters = 2, quota = 7)
      .collect().map(_.toSeq).toSet
    val b = SemDedup.clusterSample(
      rows.toDF("vec_id", "embedding").repartition(13),
      "vec_id", "embedding", numClusters = 2, quota = 7)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("null ids and vectors are dropped, not crashed on") {
    val spark = SparkTest.spark
    import spark.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), Seq(1.0f, 0f)),
      (null.asInstanceOf[java.lang.Long], Seq(1.0f, 0f)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val out = SemDedup.clusterSampleWithCentroids(df, "vec_id", "embedding",
      Array(Array(1f, 0f)), quota = 10)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L))
  }
}
