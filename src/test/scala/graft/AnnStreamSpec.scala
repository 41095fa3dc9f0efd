package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann
import graft.streaming.AnnStream

/** Streaming embedding-space decontamination: arrivals probe the
  * cell-assigned static corpus through a stream-static join; a
  * near-identical arrival is flagged against its corpus twin, an
  * anti-correlated one is not, across micro-batches. Stateless (no
  * processing-time semantics) → deterministic [[StreamSync.drain]].
  */
class AnnStreamSpec extends AnyFunSuite {

  test("near-identical arrival flagged vs its corpus twin; anti-correlated passes") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = 8
    val base = Array.tabulate(dim)(i => 1.0f + 0.1f * i)
    val ortho = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = Seq(
      (10L, base.toSeq),
      (11L, ortho.toSeq),
      (12L, base.map(-_).toSeq)
    ).toDF("vec_id", "embedding")
    // centroids from the corpus itself: 3 cells, one per direction
    val cents = Array(base, ortho, base.map(-_))
    val assigned = AnnStream.assignCells(corpus, "vec_id", "embedding", cents)
      .persist()
    try {
      assigned.count() // materialize the static side once
      val input = MemoryStream[(Long, Seq[Float])]
      val q = AnnStream.nearCorpus(input.toDS().toDF("vec_id", "embedding"), assigned,
        "vec_id", "embedding", cents, nprobe = 1, threshold = 0.9)
        .writeStream.format("memory").queryName("ann_stream")
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        val near = base.clone(); near(0) += 0.01f
        input.addData((100L, near.toSeq))
        assert(StreamSync.drain(q) {
          spark.sql("SELECT * FROM ann_stream").count() == 1
        })
        val r = spark.sql("SELECT * FROM ann_stream").collect().head
        assert(r.getLong(0) == 100L && r.getLong(1) == 10L && r.getDouble(2) > 0.99)
        // batch 2: an arrival near the NEGATED direction probes cell 2
        // and flags doc 12, not doc 10 (cells bound the scan)
        input.addData((101L, base.map(v => -v - 0.01f).toSeq))
        assert(StreamSync.drain(q) {
          spark.sql("SELECT * FROM ann_stream").count() == 2
        })
        assert(spark.sql("SELECT * FROM ann_stream WHERE qid = 101 AND cid = 12").count() == 1)
      } finally q.stop()
    } finally assigned.unpersist()
  }
}
