package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageDedup

/** Media dup-cluster resolution ([[ImageDedup.clusters]]): transitive
  * chains collapse to one keeper, identical signatures are one node,
  * isolated images cluster alone.
  */
class MediaClustersSpec extends AnyFunSuite {

  test("chain a~b~c gets one keeper even when a and c are not near") {
    val spark = SparkTest.spark
    import spark.implicits._
    // signatures: 0b0000, 0b0011, 0b1111 — ham(a,b)=2, ham(b,c)=2,
    // ham(a,c)=4 > maxDist: only transitivity links a to c; 0x780 is
    // >= 4 bits from every chain member (isolated at maxDist 2)
    val sigs = Seq((1L, 0L), (2L, 3L), (3L, 15L), (9L, 0x780L))
      .toDF("img_id", "dhash")
    val out = ImageDedup.clusters(sigs, maxDist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((0L, 1L)))
    assert(out(2L) == ((0L, 1L))) // linked via a
    assert(out(3L) == ((0L, 1L))) // linked only transitively
    assert(out(9L) == ((0x780L, 9L))) // isolated: own signature, own keeper
  }

  test("componentsAuto: forced distributed fallback equals the driver union-find path") {
    val spark = SparkTest.spark
    import spark.implicits._
    val edges = Seq((0L, 3L), (3L, 15L), (100L, 101L)).toDF("da", "db")
    val fast = graft.operators.Components.componentsAuto(edges, "da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = graft.operators.Components.componentsAuto(edges, "da", "db",
        maxDriverEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == dist && fast == Set((0L, 0L), (3L, 0L), (15L, 0L), (100L, 100L), (101L, 100L)))
  }

  test("identical signatures collapse to one node before any graph work") {
    val spark = SparkTest.spark
    import spark.implicits._
    val sigs = (0 until 50).map(i => (i.toLong, 43L)) :+ (99L, 42L)
    val out = ImageDedup.clusters(sigs.toDF("img_id", "dhash"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 43 and 42 are ham-1: all 51 images form one cluster, keeper 0
    assert(out.length == 51)
    assert(out.forall { case (_, c, k) => c == 42L && k == 0L })
  }
}
