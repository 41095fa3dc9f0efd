package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TcapPkt
import graft.streaming.TcapStream

/** Streaming TCAP sessionization: a transaction whose begin, continue and
  * end land in three different micro-batches must close exactly like the
  * batch machine — including the tid-alias close path, where the end
  * references the responder's otid that only the continue introduced.
  */
class TcapStreamSpec extends AnyFunSuite {

  // TcapStream uses flatMapGroupsWithState with ProcessingTimeTimeout:
  // the engine never quiesces, so waits are bounded StreamSync.poll
  // calls; the zero-count check first waits for the batch to have
  // CONSUMED the rows (StreamSync.awaitInputRows) so it can't pass
  // vacuously on a loaded box.

  test("begin/continue/end across micro-batches close via the alias map") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def pkt(frame: Long, mt: String, cgS: Int, cgG: String, ot: Long,
        cdS: Int, cdG: String, dt: Long) =
      TcapPkt("cap.pcap", frame, 100L + frame, 0, mt, ot, dt, cgS, cgG, cdS, cdG)

    val input = MemoryStream[TcapPkt]
    val q = TcapStream.transactions(input.toDS(), timeoutMs = 60000)
      .writeStream.format("memory").queryName("tcap_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      // batch 1: begin opens at okey 6_ga_17
      input.addData(pkt(1, "begin", 6, "ga", 0x11, 8, "gb", -1L))
      // batch 2: responder's continue — links the alias 8_gb_34 ↔ 6_ga_17
      input.addData(pkt(2, "continue", 8, "gb", 0x22, 6, "ga", 0x11))
      // batch 3: abort addressed to the responder tid → closes via alias
      input.addData(pkt(3, "abort", 6, "ga", 0x11, 8, "gb", 0x22))

      assert(StreamSync.poll(60000) {
        spark.sql("SELECT * FROM tcap_stream").count() == 1
      })
      val row = spark.sql("SELECT key, frames FROM tcap_stream").collect().head
      assert(row.getString(0) == "6_ga_17")
      assert(row.getSeq[Long](1) == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("orphan end in its own micro-batch is dropped; state cleared after close") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def pkt(frame: Long, mt: String, cgS: Int, cgG: String, ot: Long,
        cdS: Int, cdG: String, dt: Long) =
      TcapPkt("cap2.pcap", frame, 200L + frame, 0, mt, ot, dt, cgS, cgG, cdS, cdG)

    val input = MemoryStream[TcapPkt]
    val q = TcapStream.transactions(input.toDS(), timeoutMs = 60000)
      .writeStream.format("memory").queryName("tcap_stream2")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      // orphan end (nothing open, no alias) → dropped
      input.addData(pkt(1, "end", 6, "ga", -1L, 8, "gb", 0x99))
      // begin opens 6_ga_66; an end addressed to 8_gb_66 has no alias yet
      input.addData(pkt(2, "begin", 6, "ga", 0x42, 8, "gb", -1L))
      input.addData(pkt(3, "end", 8, "gb", -1L, 8, "gb", 0x42))
      assert(StreamSync.awaitInputRows(q, 3))
      assert(spark.sql("SELECT * FROM tcap_stream2").count() == 0)
      // responder continue links 8_gb_153 ↔ 6_ga_66; end to 8_gb_153 closes
      input.addData(pkt(4, "continue", 8, "gb", 0x99, 6, "ga", 0x42))
      input.addData(pkt(5, "end", 6, "ga", -1L, 8, "gb", 0x99))
      assert(StreamSync.poll(60000) {
        spark.sql("SELECT * FROM tcap_stream2").count() == 1
      })
      val row = spark.sql("SELECT key, frames FROM tcap_stream2").collect().head
      assert(row.getString(0) == "6_ga_66")
      assert(row.getSeq[Long](1) == Seq(2L, 4L, 5L))
    } finally q.stop()
  }
}
