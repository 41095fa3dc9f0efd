package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hybrid
import graft.streaming.{FusedSnapshot, HybridStream}

/** Streaming hybrid retrieval ([[HybridStream]]): the batch/stream
  * symmetry bar — the t48 fixture replayed as a drop-dir file stream
  * must converge, snapshot by snapshot, to
  * [[Hybrid.hybridTopK]]'s fused ranking row-for-row (same integer
  * RRF constants, same tie-breaks, bit-identical leg scores). No
  * processing-time semantics (NoTimeout fMGWS), so
  * [[StreamSync.drain]] is a deterministic wait.
  */
class HybridStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  // the HybridSpec fixture, two queries: docs doubling as queries
  // (t48's shape — self pairs must be excluded on both legs)
  private val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
  private val o = Seq(0.0f, 1.0f, 0.0f, 0.0f)
  private val m = Seq(0.6f, 0.8f, 0.0f, 0.0f)
  private val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta", v),
    (1L, "alpha beta gamma delta epsilon zeta eta theta", v),
    (2L, "alpha beta gamma delta epsilon zeta eta theta", o),
    (3L, "junk words only here nothing shared at all", v),
    (4L, "other filler text with zero overlap too yes", m),
    (5L, "junk words and alpha epsilon sprinkled in here", m))
  private val queries = Seq(
    (0L, "alpha", v), (0L, "gamma", v), (0L, "epsilon", v),
    (3L, "junk", v), (3L, "words", v))
  private val KLeg = 3
  private val K = 4

  private def batchReference = {
    val c = corpus.toDF("doc_id", "text", "embedding")
    val q = queries.toDF("qid", "term", "qvec")
    Hybrid.hybridTopK(c, "doc_id", "text", "embedding", q, KLeg, K)
      .orderBy(col("qid"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("static run: fused snapshot equals hybridTopK row-for-row") {
    val c = corpus.toDF("doc_id", "text", "embedding")
    val model = HybridStream.train(c, "doc_id", "text",
      queries.toDF("qid", "term", "qvec"), KLeg, K)
    val got = HybridStream.topK(c, "doc_id", "text", "embedding", model)
      .collect().sortBy(s => (s.qid, s.rank))
      .map(s => (s.qid, s.docId, s.rrf, s.rank)).toSeq
    assert(got == batchReference && got.nonEmpty)
    // every query saw all non-self docs exactly once
    assert(HybridStream.topK(c, "doc_id", "text", "embedding", model)
      .collect().forall(_.docsSeen == corpus.size - 1L))
  }

  test("re-delivered document ids are idempotent in the leg state") {
    val c = corpus.toDF("doc_id", "text", "embedding")
    val model = HybridStream.train(c, "doc_id", "text",
      queries.toDF("qid", "term", "qvec"), KLeg, K)
    // the same corpus delivered TWICE: the fused ranking must equal the
    // single-copy run (docsSeen doubles — it is a progress counter)
    val doubled = (corpus ++ corpus).toDF("doc_id", "text", "embedding")
    val got = HybridStream.topK(doubled, "doc_id", "text", "embedding", model)
      .collect().sortBy(s => (s.qid, s.rank))
      .map(s => (s.qid, s.docId, s.rrf, s.rank)).toSeq
    assert(got == batchReference && got.nonEmpty)
  }

  test("drop-dir replay: per-batch snapshots converge to the batch fusion") {
    val c = corpus.toDF("doc_id", "text", "embedding")
    val model = HybridStream.train(c, "doc_id", "text",
      queries.toDF("qid", "term", "qvec"), KLeg, K)

    // three drop files → three micro-batches (maxFilesPerTrigger=1):
    // state must accumulate across batches, not per batch
    val dir = java.nio.file.Files.createTempDirectory("hybstream").toString
    corpus.grouped(2).foreach { chunk =>
      chunk.toDF("doc_id", "text", "embedding")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val qy = HybridStream.topK(stream, "doc_id", "text", "embedding", model)
      .writeStream.format("memory").queryName("hybrid_stream")
      .outputMode("update").start()
    try {
      val expectedSeen = corpus.size - 1L
      assert(StreamSync.drain(qy) {
        val seen = spark.sql(
          "SELECT qid, max(docsSeen) FROM hybrid_stream GROUP BY qid")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        seen.size == 2 && seen.values.forall(_ == expectedSeen)
      })
      val finalRows = spark.sql("SELECT * FROM hybrid_stream").as[FusedSnapshot]
        .collect().filter(_.docsSeen == expectedSeen)
        .sortBy(s => (s.qid, s.rank))
        .map(s => (s.qid, s.docId, s.rrf, s.rank)).toSeq
      assert(finalRows == batchReference && finalRows.nonEmpty)
      // intermediate snapshots exist (the stream emitted before EOF) —
      // the per-batch Update contract, not one final dump
      val partials = spark.sql("SELECT * FROM hybrid_stream").as[FusedSnapshot]
        .collect().filter(_.docsSeen < expectedSeen)
      assert(partials.nonEmpty, "expected per-micro-batch partial snapshots")
    } finally qy.stop()
  }
}
