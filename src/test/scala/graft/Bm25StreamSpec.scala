package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25
import graft.streaming.{Bm25Hit, Bm25Stream}

/** Streaming BM25 decontamination gate: offline-trained stats, online
  * stateless scoring. Stateless and free of processing-time semantics,
  * so [[StreamSync.drain]] is a deterministic wait. Parity bar: scoring
  * the training corpus through the gate must reproduce the batch
  * kernel's scores bit-exactly.
  */
class Bm25StreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "spark joins tables with hash partitioned shuffles",
    2L -> "window functions rank rows within partitions",
    3L -> "spark spark spark shuffle shuffle",
    4L -> "an unrelated document about gardening tulips",
    5L -> "hash joins beat sort merge joins on small tables")

  private val queries: Seq[(Long, String)] =
    Seq((10L, "spark"), (10L, "joins"), (20L, "window"), (20L, "rank"))

  test("gate scores equal the batch kernel bit-exactly on the training corpus") {
    val docs = corpus.toDF("doc_id", "text")
    val q = queries.toDF("qid", "term")
    val model = Bm25Stream.train(docs, "doc_id", "text", q)

    // batch reference: k = |corpus| so the rank cut keeps everything
    val batch = Bm25.batchTopK(docs, "doc_id", "text", q, k = corpus.size)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(2)).toMap

    val hits = Bm25Stream.decontaminate(docs, "doc_id", "text", model, threshold = 0L)
      .collect().map(h => (h.docId, h.qid) -> h.score).toMap
    assert(hits.keySet === batch.keySet)
    hits.foreach { case (k, s) =>
      assert(s === batch(k), s"score mismatch for $k") // bit-exact, no tolerance
    }
  }

  test("streaming arrivals flag above-threshold docs; stream == static gate") {
    val docs = corpus.toDF("doc_id", "text")
    val model = Bm25Stream.train(docs, "doc_id", "text", queries.toDF("qid", "term"))
    val threshold = 500000L
    val static = Bm25Stream.decontaminate(docs, "doc_id", "text", model, threshold)
      .collect().map(h => (h.docId, h.qid, h.score)).toSet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val qy = Bm25Stream.decontaminate(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", model, threshold)
      .writeStream.format("memory").queryName("bm25_gate")
      .outputMode("append").start()
    try {
      input.addData(corpus: _*)
      assert(StreamSync.drain(qy) {
        spark.sql("SELECT * FROM bm25_gate").count() == static.size
      })
      val got = spark.sql("SELECT * FROM bm25_gate").as[Bm25Hit]
        .collect().map(h => (h.docId, h.qid, h.score)).toSet
      assert(got === static)
      // the gardening doc shares no term with any query: never flagged
      assert(!got.exists(_._1 == 4L))
    } finally qy.stop()
  }

  test("a pruned (>=80% df) term contributes nothing through the gate") {
    // "common" in 5/5 docs -> pruned at train time
    val docs = Seq(
      1L -> "common alpha", 2L -> "common beta", 3L -> "common gamma",
      4L -> "common delta", 5L -> "common epsilon").toDF("doc_id", "text")
    val model = Bm25Stream.train(docs, "doc_id", "text",
      Seq((1L, "common")).toDF("qid", "term"))
    assert(model.df.isEmpty)
    assert(Bm25Stream.decontaminate(docs, "doc_id", "text", model, 0L).count() === 0L)
  }
}
