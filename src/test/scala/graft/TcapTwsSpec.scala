package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TcapPkt
import graft.streaming.TcapTws

/** TCAP sessionization on transformWithState: the same cross-micro-batch
  * alias-close behavior as the flatMapGroupsWithState variant, plus the
  * registered-timer residue flush for still-open transactions.
  */
class TcapTwsSpec extends AnyFunSuite {

  // TcapTws registers processing-time timers (transformWithState), so
  // waits are bounded StreamSync.poll calls — the engine keeps a timer
  // batch pending and processAllAvailable would not be safe.

  private def withRocksDb[T](body: => T): T = {
    val spark = SparkTest.spark
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def pkt(cap: String)(frame: Long, mt: String, cgS: Int, cgG: String, ot: Long,
      cdS: Int, cdG: String, dt: Long) =
    TcapPkt(cap, frame, 100L + frame, 0, mt, ot, dt, cgS, cgG, cdS, cdG)

  test("begin/continue/abort across micro-batches close via the alias map") {
    withRocksDb {
      val spark = SparkTest.spark
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val p = pkt("tws.pcap") _
      val input = MemoryStream[TcapPkt]
      val q = TcapTws.transactions(input.toDS(), timeoutMs = 60000)
        .writeStream.format("memory").queryName("tcap_tws")
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        input.addData(p(1, "begin", 6, "ga", 0x11, 8, "gb", -1L))
        input.addData(p(2, "continue", 8, "gb", 0x22, 6, "ga", 0x11))
        input.addData(p(3, "abort", 6, "ga", 0x11, 8, "gb", 0x22))
        assert(StreamSync.poll(60000) {
          spark.sql("SELECT * FROM tcap_tws").count() == 1
        })
        val row = spark.sql("SELECT key, frames FROM tcap_tws").collect().head
        assert(row.getString(0) == "6_ga_17")
        assert(row.getSeq[Long](1) == Seq(1L, 2L, 3L))
      } finally q.stop()
    }
  }

  test("registered timer flushes a still-open transaction under keepPartial") {
    withRocksDb {
      val spark = SparkTest.spark
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val p = pkt("tws2.pcap") _
      val input = MemoryStream[TcapPkt]
      val q = TcapTws.transactions(input.toDS(), timeoutMs = 500, keepPartial = true)
        .writeStream.format("memory").queryName("tcap_tws2")
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        // begin only — never closed; the sliding inactivity timer fires
        // and surfaces the partial transaction (sigshark --incomplete)
        input.addData(p(1, "begin", 6, "ga", 0x33, 8, "gb", -1L))
        assert(StreamSync.poll(60000) {
          spark.sql("SELECT * FROM tcap_tws2").count() == 1
        })
        val row = spark.sql("SELECT key, frames FROM tcap_tws2").collect().head
        assert(row.getString(0) == "6_ga_51")
        assert(row.getSeq[Long](1) == Seq(1L))
      } finally q.stop()
    }
  }
}
