package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.{GtpPipeline, SmppPipeline}

class GtpSmppPipelineSpec extends AnyFunSuite {

  test("GTP pipeline: decode + J3 last-non-empty enrichment per seq") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    // GTPv2 Create Session Request with IMSI, seq 5
    val imsiTbcd = Array(0x21, 0x43, 0x65, 0x87, 0x09, 0x21, 0x43, 0xf5).map(_.toByte)
    val ie = cat(Array[Byte](1), be16(imsiTbcd.length), Array[Byte](0), imsiTbcd)
    val reqMsg = cat(Array[Byte](0x48, 32), be16(8 + 4 + ie.length), be32(0xabcdL),
      cat(Array[Byte](0, 0, 5), Array[Byte](0)), ie)
    // GTPv2 Create Session Response, same seq, no IMSI
    val resMsg = cat(Array[Byte](0x48, 33), be16(8 + 4), be32(0xdcbaL),
      cat(Array[Byte](0, 0, 5), Array[Byte](0)))
    def udpFrame(src: Array[Byte], dst: Array[Byte], payload: Array[Byte]) = {
      val udp = cat(be16(2123), be16(2123), be16(8 + payload.length), be16(0), payload)
      ether(ipv4(17, src, dst, udp))
    }
    val pcap = pcapFile(Seq((100L, 0, udpFrame(a, b, reqMsg)), (101L, 0, udpFrame(b, a, resMsg))))
    val dir = Files.createTempDirectory("graftgtp")
    Files.write(dir.resolve("g.pcap"), pcap)
    val rows = GtpPipeline.records(SparkTest.spark, dir.toString + "/*.pcap")
      .collect().sortBy(_.getAs[String]("framesList"))
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("gtpMessage") == "Create Session Request")
    assert(rows(1).getAs[String]("gtpMessage") == "Create Session Response")
    // J3: response (no IMSI on the wire) enriched from the request
    assert(rows(1).getAs[String]("imsi") == "123456789012345")
  }

  test("SMPP pipeline: framing + J2 addr propagation + D3 dedup") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    def pdu(cmd: Long, seq: Long, body: Array[Byte]): Array[Byte] =
      cat(be32(16L + body.length), be32(cmd), be32(0), be32(seq), body)
    val body = cat("SMS".getBytes, Array[Byte](0), Array[Byte](1, 1),
      "15550001".getBytes, Array[Byte](0), Array[Byte](1, 1),
      "15559999".getBytes, Array[Byte](0))
    def tcpFrame(src: Array[Byte], dst: Array[Byte], sp: Int, dp: Int, seq: Long, payload: Array[Byte]) =
      ether(ipv4(6, src, dst, tcp(sp, dp, seq, 1, 24, payload)))
    val pcap = pcapFile(Seq(
      (100L, 0, tcpFrame(a, b, 2775, 2775, 1, pdu(4, 9, body))), // submit_sm
      (101L, 0, tcpFrame(b, a, 2775, 2775, 1, pdu(0x80000004L, 9, Array.emptyByteArray))))) // resp
    val dir = Files.createTempDirectory("graftsmpp")
    Files.write(dir.resolve("s.pcap"), pcap)
    val rows = SmppPipeline.records(SparkTest.spark, dir.toString + "/*.pcap")
      .collect().sortBy(_.getAs[String]("framesList"))
    assert(rows.length == 2)
    val resp = rows.find(_.getAs[String]("commandId") == "submit_sm_resp").get
    // J2: response enriched with the request's addresses
    assert(resp.getAs[String]("sourceAddr") == "15550001")
    assert(resp.getAs[String]("destinationAddr") == "15559999")
  }
}
