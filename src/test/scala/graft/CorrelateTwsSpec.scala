package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CorrelateTws, Sessions}
import graft.streaming.Sessions.CorrEvent

class CorrelateTwsSpec extends AnyFunSuite {

  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("transformWithState correlate: pairs + timer-based residue flush") {
    val spark = SparkTest.spark
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      val input = MemoryStream[CorrEvent]
      val q = CorrelateTws.correlate(input.toDS(), timeoutMs = 500)
        .writeStream.format("memory").queryName("corr_tws")
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        input.addData(
          CorrEvent("k1", isRequest = true, 1, "req"),
          CorrEvent("k1", isRequest = false, 2, "ans"),
          CorrEvent("k2", isRequest = true, 3, "lonely"))
        assert(eventually(30000) {
          spark.sql("SELECT * FROM corr_tws WHERE matched").count() == 1
        })
        assert(spark.sql("SELECT * FROM corr_tws WHERE matched")
          .as[Sessions.CorrPair].head() == Sessions.CorrPair("k1", 1L, 2L, matched = true))
        // k2 flushes via the registered timer
        assert(eventually(30000) {
          spark.sql("SELECT * FROM corr_tws").as[Sessions.CorrPair].collect()
            .contains(Sessions.CorrPair("k2", 3L, -1L, matched = false))
        })
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState correlate: matched request deletes its timer " +
      "(no spurious flush of a later request on the same key)") {
    val spark = SparkTest.spark
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      val input = MemoryStream[CorrEvent]
      val q = CorrelateTws.correlate(input.toDS(), timeoutMs = 3000)
        .writeStream.format("memory").queryName("corr_tws2")
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        // Cycle 1: matched within one batch; its timer must be deleted.
        input.addData(
          CorrEvent("k1", isRequest = true, 1, "req"),
          CorrEvent("k1", isRequest = false, 2, "ans"))
        assert(eventually(30000) {
          spark.sql("SELECT * FROM corr_tws2 WHERE matched").count() == 1
        })
        // Cycle 2 starts well before cycle 1's (stale) timer would fire...
        Thread.sleep(2000)
        input.addData(CorrEvent("k1", isRequest = true, 3, "req2"))
        // ...and its answer arrives after that stale expiry but before
        // cycle 2's own timeout. A leaked timer would flush frame 3 as
        // unmatched here; the fix keeps it pending.
        Thread.sleep(1600)
        input.addData(CorrEvent("k1", isRequest = false, 4, "ans2"))
        assert(eventually(30000) {
          spark.sql("SELECT * FROM corr_tws2 WHERE matched").count() == 2
        })
        assert(spark.sql("SELECT * FROM corr_tws2 WHERE NOT matched").count() == 0)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
