package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** k-means‖ init: deterministic, returns k centers, and — the reason it
  * exists — clusters at least as well as naive first-k seeding after
  * the same number of Lloyd's rounds (everything here is deterministic,
  * so these are fixed numbers, not flaky statistics).
  */
class KmeansInitSpec extends AnyFunSuite {

  private val d = "/root/testdata/sf0.01"
  private val k = 16

  test("kmeans-parallel init beats first-k seeding at equal Lloyd's rounds") {
    val spark = SparkTest.spark
    val e = Tables.embeddings(spark, d)
    val parInit = Ann.kmeansParallelInit(e, "vec_id", "embedding", k)
    assert(parInit.length == k)
    assert(parInit.map(_.toSeq).distinct.length == k, "centers must be distinct")

    val firstK = e.filter(col("vec_id") < k).orderBy(col("vec_id"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val costPar = Ann.kmeansCost(e, "embedding",
      Ann.kmeansCentroids(e, "embedding", parInit, iters = 2))
    val costFirst = Ann.kmeansCost(e, "embedding",
      Ann.kmeansCentroids(e, "embedding", firstK, iters = 2))
    assert(costPar <= costFirst,
      s"kmeans-parallel init cost $costPar should not exceed first-k cost $costFirst")
  }

  test("init is deterministic across invocations") {
    val spark = SparkTest.spark
    val e = Tables.embeddings(spark, d)
    val a = Ann.kmeansParallelInit(e, "vec_id", "embedding", k)
    val b = Ann.kmeansParallelInit(e, "vec_id", "embedding", k)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
