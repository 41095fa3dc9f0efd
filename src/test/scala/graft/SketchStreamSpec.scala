package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** The sketches' streaming deployment: [[Sketches.cmsGrid]] and
  * [[Sketches.hllRegisterRows]] are the SAME groupBy kernels run on a
  * streaming frame under complete mode — counters merge by addition,
  * registers by max, across micro-batches. Stateless-free wait rules:
  * plain streaming aggregations quiesce under processAllAvailable, so
  * [[StreamSync.drain]] applies.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val batchA: Seq[(Long, String)] = Seq(
    1L -> "spark joins tables with shuffles",
    2L -> "window functions rank rows")
  private val batchB: Seq[(Long, String)] = Seq(
    3L -> "spark spark shuffle shuffle window",
    4L -> "gardening tulips and window boxes")

  test("streaming CMS grid after two micro-batches equals the batch grid of the union") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Sketches.cmsGrid(input.toDS().toDF("doc_id", "text"), "text", 4, 16)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      input.addData(batchA: _*)
      assert(StreamSync.drain(q) {
        spark.sql("SELECT sum(cnt) FROM cms_stream").collect().head.getLong(0) > 0
      })
      input.addData(batchB: _*)
      val wantTotal = Sketches.cmsGrid((batchA ++ batchB).toDF("doc_id", "text"),
        "text", 4, 16).collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(StreamSync.drain(q) {
        spark.sql("SELECT sum(cnt) FROM cms_stream").collect().head.getLong(0) ==
          wantTotal.values.sum
      })
      val got = spark.sql("SELECT * FROM cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === wantTotal)
    } finally q.stop()
  }

  test("streaming HLL registers max-merge across micro-batches to the batch registers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Sketches.hllRegisterRows(input.toDS().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      input.addData(batchA: _*)
      assert(StreamSync.drain(q) {
        spark.sql("SELECT count(*) FROM hll_stream").collect().head.getLong(0) > 0
      })
      input.addData(batchB: _*)
      val want = Sketches.hllRegisterRows((batchA ++ batchB).toDF("doc_id", "text"), "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM hll_stream").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap == want
      })
    } finally q.stop()
  }
}
