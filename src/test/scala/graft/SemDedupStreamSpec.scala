package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann
import graft.streaming.{SemDedupStream, SemMatch}

/** Streaming semantic decontamination: broadcast cluster index,
  * stateless cosine gate. Stateless → `processAllAvailable` waits
  * deterministically. */
class SemDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val Dim = 8
  private def vec(seed: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"sds_$seed".getBytes("UTF-8"))
    Array.tabulate(Dim)(j => ((md(j) & 0xff) - 128) / 128.0f)
  }
  private def nudge(v: Array[Float]): Array[Float] =
    v.zipWithIndex.map { case (x, j) => x + (if (j == 0) 0.01f else 0f) }

  test("near-dups of the reference are flagged on arrival; unrelated vectors pass") {
    val refRows = (0 until 12).map(i => (i.toLong, vec(i).toSeq))
    val ref = refRows.toDF("vec_id", "embedding")
    val index = SemDedupStream.buildIndex(ref, "vec_id", "embedding", numClusters = 4)
    assert(index.size === 12)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = SemDedupStream.matches(
      input.toDS().toDF("vec_id", "embedding"), index, "vec_id", "embedding", 0.99)
      .writeStream.format("memory").queryName("sem_gate")
      .outputMode("append").start()
    try {
      input.addData(
        100L -> nudge(vec(3)).toSeq, // near-dup of ref 3
        101L -> nudge(vec(7)).toSeq, // near-dup of ref 7
        102L -> vec(999).toSeq) // unrelated
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM sem_gate").count() >= 2
      })
      val got = spark.sql("SELECT * FROM sem_gate").as[SemMatch].collect()
      val byArrival = got.groupBy(_.vecId)
      assert(byArrival(100L).exists(_.refId == 3L))
      assert(byArrival(101L).exists(_.refId == 7L))
      assert(!byArrival.contains(102L))
      // the assigned cell matches the shared kernel's rule
      got.foreach { m =>
        val v = if (m.vecId == 100L) nudge(vec(3)) else nudge(vec(7))
        assert(m.clusterId === Ann.nearestCell(index.cents, v).toLong)
        assert(m.cosine >= 0.99)
      }
    } finally q.stop()
  }

  test("the broadcast bound is enforced loudly") {
    val ref = (0L until 50L).map(i => (i, vec(i.toInt).toSeq)).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemDedupStream.buildIndex(ref, "vec_id", "embedding", 4, maxEntries = 10)
    }
    assert(e.getMessage.contains("maxEntries"))
  }
}
