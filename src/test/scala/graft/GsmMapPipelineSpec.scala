package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.GsmMapPipeline

class GsmMapPipelineSpec extends AnyFunSuite {

  private def ber(tag: Int, value: Array[Byte]): Array[Byte] =
    cat(Array(tag.toByte, value.length.toByte), value)

  test("pcap → m3ua → sccp → tcap pipeline emits ss7map rows") {
    val imsiTbcd = Array(0x21, 0x43, 0x65, 0x87, 0x09, 0x21, 0x43, 0xf5).map(_.toByte)
    val invoke = ber(0xa1, cat(
      ber(0x02, Array[Byte](1)),
      ber(0x02, Array[Byte](45)),
      ber(0x30, ber(0x04, imsiTbcd))))
    val begin = ber(0x62, cat(ber(0x48, Array[Byte](0x11, 0x22)), ber(0x6c, invoke)))
    // SCCP UDT wrapping the TCAP payload
    val called = Array[Byte](0x12)
    val calling = Array[Byte](0x34)
    val sccp = cat(Array[Byte](9, 0),
      Array[Byte](3, (3 + called.length).toByte, (3 + called.length + calling.length).toByte),
      Array(called.length.toByte), called,
      Array(calling.length.toByte), calling,
      Array(begin.length.toByte), begin)
    // M3UA transfer-DATA with protocol-data param (SI=3)
    val pd = cat(be32(101), be32(202), Array[Byte](3, 2, 0, 0), sccp)
    val param = cat(be16(0x0210), be16(4 + pd.length), pd)
    val m3ua = cat(Array[Byte](1, 0, 1, 1), be32(8L + param.length), param)
    val frame = ether(ipv4(132, Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      sctpData(2905, 2905, 0, 0, 3L, m3ua)))
    val dir = Files.createTempDirectory("graftss7")
    Files.write(dir.resolve("m.pcap"), pcapFile(Seq((100L, 0, frame))))

    val rows = GsmMapPipeline.records(SparkTest.spark, dir.toString + "/*.pcap").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("mtp3Opc") == 101 && r.getAs[Int]("mtp3Dpc") == 202)
    assert(r.getAs[String]("tcapMessType") == "begin")
    assert(r.getAs[Long]("tcapTid") == 0x1122L)
    assert(r.getAs[Int]("gsmOpCode") == 45)
    assert(r.getAs[String]("imsi") == "123456789012345")
  }

  test("DLT 141: MTP3-on-wire capture reaches ss7map rows without M3UA") {
    val imsiTbcd = Array(0x21, 0x43, 0x65, 0x87, 0x09, 0x21, 0x43, 0xf5).map(_.toByte)
    val invoke = ber(0xa1, cat(
      ber(0x02, Array[Byte](1)),
      ber(0x02, Array[Byte](45)),
      ber(0x30, ber(0x04, imsiTbcd))))
    val begin = ber(0x62, cat(ber(0x48, Array[Byte](0x11, 0x22)), ber(0x6c, invoke)))
    val sccp = TestBytes.sccpUdt(
      sccpAddrGt(6, Array(0x65, 0x87).map(_.toByte)),
      sccpAddrGt(8, Array(0x21, 0x43).map(_.toByte)),
      begin)
    val frame = mtp3(77, 88, sccp)
    val dir = Files.createTempDirectory("graftmtp3")
    Files.write(dir.resolve("m.pcapng"), pcapngFile(141, Seq((100L * 1000000L, frame))))

    val rows = GsmMapPipeline.records(SparkTest.spark, dir.toString + "/*.pcapng").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("mtp3Opc") == 77 && r.getAs[Int]("mtp3Dpc") == 88)
    assert(r.getAs[String]("tcapMessType") == "begin")
    assert(r.getAs[String]("imsi") == "123456789012345")
    assert(r.getAs[String]("srcIp") == "")

    // the same capture also feeds the sigshark TCAP key fields
    val pkts = GsmMapPipeline.tcapPackets(SparkTest.spark, dir.toString + "/*.pcapng").collect()
    assert(pkts.length == 1)
    assert(pkts.head.cgSsn == 8 && pkts.head.cgGt == "1234")
    assert(pkts.head.cdSsn == 6 && pkts.head.cdGt == "5678")
  }
}
