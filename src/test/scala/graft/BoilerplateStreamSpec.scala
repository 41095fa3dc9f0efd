package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate
import graft.streaming.{BoilerplateCleaned, BoilerplateStream}

/** Streaming boilerplate gate: offline-trained bad-chunk set, online
  * stateless surgery. Stateless and free of processing-time semantics,
  * so [[StreamSync.drain]]'s `processAllAvailable()` is a deterministic
  * wait.
  */
class BoilerplateStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val banner = "subscribe to our newsletter"
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> s"$banner alpha beta gamma delta",
    2L -> s"$banner epsilon zeta eta theta",
    3L -> s"$banner iota kappa lambda mu",
    4L -> "a clean document with original content",
    5L -> "")

  test("stream output equals the batch operator on the training corpus") {
    val docs = corpus.toDF("doc_id", "text")
    val bad = BoilerplateStream.trainBadChunks(docs, "doc_id", "text", k = 4, maxDocFreq = 3)
    assert(bad.nonEmpty)
    val batch = Boilerplate.remove(docs, "doc_id", "text", 4, 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = BoilerplateStream.clean(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", 4, bad)
      .writeStream.format("memory").queryName("boiler_gate")
      .outputMode("append").start()
    try {
      input.addData(corpus: _*)
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM boiler_gate").count() == corpus.size
      })
      val got = spark.sql("SELECT * FROM boiler_gate").as[BoilerplateCleaned]
        .collect().map(c => c.docId -> ((c.cleanText, c.nChunks, c.nDropped))).toMap
      assert(got === batch)
      assert(got(1L)._3 === 1L) // the banner chunk was actually cut
    } finally q.stop()
  }

  test("the gate is frozen: stream-only repetition is not cut, unseen docs pass through") {
    val train = corpus.toDF("doc_id", "text")
    val bad = BoilerplateStream.trainBadChunks(train, "doc_id", "text", k = 4, maxDocFreq = 3)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = BoilerplateStream.clean(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", 4, bad)
      .writeStream.format("memory").queryName("boiler_frozen")
      .outputMode("append").start()
    try {
      val fresh = "brand new repeated footer line"
      input.addData(
        10L -> s"$fresh first body words here",
        11L -> s"$fresh second body words here",
        12L -> s"$fresh third body words here",
        13L -> s"$banner late arrival body text")
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM boiler_frozen").count() == 4
      })
      val got = spark.sql("SELECT * FROM boiler_frozen").as[BoilerplateCleaned]
        .collect().map(c => c.docId -> c).toMap
      // stream-only repetition survives (frozen set)
      assert((10L to 12L).forall(got(_).nDropped == 0))
      // the TRAINED banner is still cut from late arrivals
      assert(got(13L).nDropped === 1L)
      assert(got(13L).cleanText === "late arrival body text")
    } finally q.stop()
  }

  test("trainBadChunks enforces the driver bound loudly") {
    val docs = (0L until 30L).map(i => (i, "shared common footer every doc"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BoilerplateStream.trainBadChunks(docs, "doc_id", "text", 3, 2, maxEntries = 1)
    }
    assert(e.getMessage.contains("maxEntries"))
  }
}
