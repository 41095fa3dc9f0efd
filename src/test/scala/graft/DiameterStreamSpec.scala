package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.streaming.DiameterStream

/** File-watch streaming ingestion: captures dropped into a directory are
  * picked up per micro-batch; correlation state spans batches (an answer
  * arriving in a LATER file still pairs with its request).
  */
class DiameterStreamSpec extends AnyFunSuite {

  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("drop-dir stream: cross-file correlation across micro-batches") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graftdrop")
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    def sctpFrame(src: Array[Byte], dst: Array[Byte], payload: Array[Byte]) =
      ether(ipv4(132, src, dst, sctpData(3868, 3868, 1, 1, 46L, payload)))
    val req = diameterMsg(request = true, 316, 5, 5, strAvp(263, "s5"),
      groupedAvp(443, u32Avp(450, 0), strAvp(444, "5215")))
    val ans = diameterMsg(request = false, 316, 5, 5, strAvp(263, "s5"), u32Avp(268, 2001))

    val q = DiameterStream.records(spark, dir.toString, timeoutMs = 600000)
      .writeStream.format("memory").queryName("diam_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      // batch 1: request only — nothing should emit (held in state)
      Files.write(dir.resolve("cap1.pcap"), pcapFile(Seq((1000L, 0, sctpFrame(a, b, req)))))
      Thread.sleep(1500)
      assert(spark.sql("SELECT * FROM diam_stream").count() == 0)
      // batch 2: the answer arrives in a separate file
      Files.write(dir.resolve("cap2.pcap"), pcapFile(Seq((1001L, 0, sctpFrame(b, a, ans)))))
      assert(eventually(30000) { spark.sql("SELECT * FROM diam_stream").count() == 2 })
      val rows = spark.sql("SELECT * FROM diam_stream")
        .as[graft.etl.DiameterRec].collect().sortBy(_.framesList)
      // J1 enrichment across micro-batches: answer got the request's msisdn
      assert(rows.exists(r => !r.request && r.msisdn == "5215" && r.resultCode.contains(2001L)))
      assert(rows.exists(r => r.request && r.pcapFilename.endsWith("cap1.pcap")))
    } finally q.stop()
  }
}
