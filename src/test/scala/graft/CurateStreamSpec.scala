package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CurateStream

/** Streaming curation gate: the stateless score/gate/split prefix must
  * agree with the batch chain exactly, and the dedup stage keeps the
  * first arrival within the watermark horizon.
  *
  * The dedup operator is timer-free (dropDuplicatesWithinWatermark), so
  * waits are deterministic [[StreamSync.drain]]s.
  */
class CurateStreamSpec extends AnyFunSuite {

  private val spark = SparkTest.spark

  // passes the quality gate: long enough for the length half of the
  // score, stopword-dense for the ratio half, 'the/a/of' marks it en
  private def goodText(tag: String): String =
    (s"the a of to and it is in $tag " * 12).trim

  test("gate agrees with the batch chain on gated fields; dup dropped within horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1000000L
    val rows = Seq(
      (10L, goodText("x"), new Timestamp(t0)),
      (11L, "der die das und zu kurz", new Timestamp(t0)), // de → gated out
      (12L, "tiny", new Timestamp(t0)), // low score → gated out
      (13L, goodText("y"), new Timestamp(t0 + 1000)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = CurateStream.gate(
      input.toDS().toDF("doc_id", "text", "ts"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData(rows: _*)
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM curate_stream").count() == 2
      })
      // batch 2: a content repeat of doc 10 inside the horizon → dropped
      input.addData((14L, goodText("x"), new Timestamp(t0 + 2000)))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM curate_stream").count() == 2
      })
      val got = spark.sql(
        "SELECT doc_id, quality_score, n_tokens, split FROM curate_stream ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3))).toSeq
      // the batch chain on the same kept docs: identical scores, token
      // counts, and split assignment (shared code paths)
      val batch = graft.queries.Text.curateChain(
        rows.map { case (id, tx, _) => (id, tx) }.toDF("doc_id", "text"))
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(4))).toSeq
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }
}
