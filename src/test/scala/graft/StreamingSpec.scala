package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessions
import graft.streaming.Sessions.{CorrEvent, SessionEvent}

/** Structured-Streaming statefuls driven through MemoryStream — the
  * streaming extension of SURVEY §2.10 (state machines shared with the
  * batch path).
  */
class StreamingSpec extends AnyFunSuite {

  /** Poll until `cond` holds — `processAllAvailable` can NOT be used here:
    * with ProcessingTimeTimeout the engine always reports another batch
    * pending, so it never quiesces. */
  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("streaming correlate: match emits pair, timeout flushes residue") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[CorrEvent]
    val q = Sessions.correlate(input.toDS(), timeoutMs = 500)
      .writeStream.format("memory").queryName("corr")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData(
        CorrEvent("k1", isRequest = true, 1, "req"),
        CorrEvent("k1", isRequest = true, 2, "retrans"),
        CorrEvent("k1", isRequest = false, 3, "ans"),
        CorrEvent("k2", isRequest = true, 4, "lonely"))
      assert(eventually(30000) {
        spark.sql("SELECT * FROM corr WHERE matched").count() == 1
      })
      val matched = spark.sql("SELECT * FROM corr WHERE matched").as[Sessions.CorrPair].collect()
      assert(matched.toSeq == Seq(Sessions.CorrPair("k1", 1L, 3L, matched = true)))
      // k2's pending request must flush via state timeout (K3 analog)
      assert(eventually(30000) {
        spark.sql("SELECT * FROM corr").as[Sessions.CorrPair].collect()
          .contains(Sessions.CorrPair("k2", 4L, -1L, matched = false))
      })
      // unmatched answer passes straight through
      input.addData(CorrEvent("k3", isRequest = false, 9, "late-ans"))
      assert(eventually(30000) {
        spark.sql("SELECT * FROM corr").as[Sessions.CorrPair].collect()
          .contains(Sessions.CorrPair("k3", -1L, 9L, matched = false))
      })
    } finally q.stop()
  }

  test("batch sessionize: gap split matches the windowed-SQL analog") {
    val spark = SparkTest.spark
    import spark.implicits._
    val events = Seq(
      SessionEvent(1, 0L, 1, 1.0),
      SessionEvent(1, 1000L, 2, 2.0),
      SessionEvent(1, 100000L, 3, 3.0), // gap > 10ms → new session
      SessionEvent(2, 0L, 4, 4.0)).toDS()
    val out = Sessions.sessionize(events, gapMicros = 10000L, flushAtEnd = true)
      .collect().sortBy(s => (s.key, s.sessionStart))
    assert(out.length == 3)
    assert(out(0).nEvents == 2 && out(0).sumValue == 3.0)
    assert(out(1).nEvents == 1 && out(1).sessionStart == 100000L)
    assert(out(2).key == 2L)
  }
}
