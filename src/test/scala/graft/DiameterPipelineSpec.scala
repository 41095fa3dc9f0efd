package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.DiameterPipeline
import graft.functions.CodecExpressions

/** Golden end-to-end test (SURVEY §5 item 3): synthetic pcap → full
  * Spark pipeline → expected correlated rows, plus the Catalyst
  * expression registration path.
  */
class DiameterPipelineSpec extends AnyFunSuite {

  private def sctpFrame(src: Array[Byte], dst: Array[Byte], streamSeq: Int,
      payload: Array[Byte]): Array[Byte] =
    ether(ipv4(132, src, dst, sctpData(3868, 3868, 1, streamSeq, 46L, payload)))

  test("pcap → decode → reassemble → correlate → DiameterRec rows") {
    val clientIp = Array[Byte](10, 0, 0, 1)
    val serverIp = Array[Byte](10, 0, 0, 2)
    val req = diameterMsg(request = true, cmd = 316, hbh = 0x1111L, e2e = 0x2222L,
      strAvp(263, "sess;42"), strAvp(264, "mme.a"),
      groupedAvp(443, u32Avp(450, 0), strAvp(444, "5215512345678")))
    val ans = diameterMsg(request = false, cmd = 316, hbh = 0x1111L, e2e = 0x2222L,
      strAvp(263, "sess;42"), u32Avp(268, 2001), strAvp(1, "123456789012345@epc"))
    // split the request across two SCTP segments (same stream seq) → R1
    val (reqA, reqB) = req.splitAt(30)
    val pcap = pcapFile(Seq(
      (1000L, 1, sctpFrame(clientIp, serverIp, 10, reqA)),
      (1000L, 2, sctpFrame(clientIp, serverIp, 10, reqB)),
      (1001L, 3, sctpFrame(serverIp, clientIp, 11, ans))))
    val dir = Files.createTempDirectory("graftpcap")
    Files.write(dir.resolve("cap1.pcap"), pcap)

    val spark = SparkTest.spark
    val rows = DiameterPipeline.records(spark, dir.toString + "/*.pcap").collect().sortBy(_.framesList)
    assert(rows.length == 2)
    val Array(reqRow, ansRow) = rows
    assert(reqRow.framesList == "1 2") // reassembled from two frames
    assert(ansRow.framesList == "3")
    assert(reqRow.request && !ansRow.request)
    assert(reqRow.commandCode == 316 && ansRow.commandCode == 316)
    assert(ansRow.resultCode.contains(2001L))
    // J1 bidirectional fill: msisdn from request → answer, imsi (NAI) from
    // answer → request
    assert(ansRow.msisdn == "5215512345678")
    assert(reqRow.imsi == "123456789012345")
    assert(reqRow.srcIp == "10.0.0.1" && reqRow.dstIp == "10.0.0.2")
    assert(reqRow.timeEpoch == 1000L)
  }

  test("tbcd_decode usable from DataFrame API and SQL") {
    val spark = SparkTest.spark
    import spark.implicits._
    CodecExpressions.register(spark)
    val df = Seq(Array(0x21, 0xf3).map(_.toByte)).toDF("b")
    assert(df.select(CodecExpressions.tbcd_decode($"b")).as[String].head() == "123")
    df.createOrReplaceTempView("tb")
    assert(spark.sql("SELECT tbcd_decode(b) FROM tb").as[String].head() == "123")
  }

  test("fvec_dot usable from SQL") {
    val spark = SparkTest.spark
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b").createOrReplaceTempView("vv")
    assert(spark.sql("SELECT fvec_dot(a, b) FROM vv").as[Double].head() == 32.0)
  }
}
