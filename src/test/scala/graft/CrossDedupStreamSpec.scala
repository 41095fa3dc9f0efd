package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CrossDedupStream, NearPair}

/** Streaming decontamination: arriving documents probe a broadcast LSH
  * index of a fixed reference corpus. A near-dup of a reference doc is
  * flagged whenever it arrives (stateless — no retention horizon);
  * stream-internal duplicates must NOT pair with each other; one pair
  * per (arrival, reference member) even when every band collides.
  *
  * The query is a stateless narrow map, so every wait is a
  * deterministic [[StreamSync.drain]].
  */
class CrossDedupStreamSpec extends AnyFunSuite {

  test("arrivals pair with the reference only, once per member, across batches") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content with no shared trigrams at all here"
    val reference = Seq(
      (0L, template),
      (1L, "reference body with its own completely distinct wording here"),
      (2L, template) // two reference members share the template
    ).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val q = CrossDedupStream.decontaminate(
      input.toDS().toDF("doc_id", "text"), reference,
      "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      // batch 1: one contaminated arrival, one clean
      input.addData((100L, template), (101L, other))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM decon_stream").count() == 2
      })
      // batch 2, much later in stream time: another contaminated copy —
      // stateless probe has no horizon, AND 100/102 do not pair with
      // each other (stream-internal dups are the batch dedup's job)
      input.addData((102L, template))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM decon_stream").count() == 4
      })
      val pairs = spark.sql("SELECT * FROM decon_stream").as[NearPair]
        .collect().map(p => (p.da, p.db)).toSet
      assert(pairs == Set((100L, 0L), (100L, 2L), (102L, 0L), (102L, 2L)))
      assert(spark.sql("SELECT * FROM decon_stream WHERE jaccard < 1.0").count() == 0)
    } finally q.stop()
  }
}
