package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

/** Streaming exact dedup: a duplicate document arriving in a LATER
  * micro-batch must still be dropped (state carries the seen hashes),
  * and only the first sighting survives.
  *
  * Both operators are timer-free (dropDuplicates /
  * dropDuplicatesWithinWatermark), so every wait here is a
  * deterministic [[StreamSync.drain]] on the query handle — no
  * wall-clock dependence under load.
  */
class DedupStreamSpec extends AnyFunSuite {

  test("duplicates across micro-batches are dropped; firsts survive") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupStream.exact(input.toDS().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM dedup_stream").count() == 2
      })
      // batch 2: one repeat from batch 1, one new
      input.addData((4L, "beta"), (5L, "gamma"))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM dedup_stream").count() == 3
      })
      val texts = spark.sql("SELECT text FROM dedup_stream").collect()
        .map(_.getString(0)).sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("withinWatermark: repeat inside the window dropped, state evicted after it") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = DedupStream.withinWatermark(
      input.toDS().toDF("doc_id", "text", "ts"), "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      val t0 = 1000000L
      input.addData((1L, "doc", new Timestamp(t0)),
        (2L, "doc", new Timestamp(t0 + 2000))) // repeat within window
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM dedup_wm").count() == 1
      })
      // advance the watermark far past the window, then repeat again:
      // the old hash state was evicted, so the doc re-emits (the
      // documented unbounded-ingest trade — global dedup is the batch
      // compaction's job)
      input.addData((3L, "advance", new Timestamp(t0 + 60000)))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM dedup_wm").count() == 2
      })
      input.addData((4L, "doc", new Timestamp(t0 + 55000)))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM dedup_wm").count() == 3
      })
    } finally q.stop()
  }
}
