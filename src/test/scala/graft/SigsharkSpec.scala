package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.Sigshark
import graft.sources.Pcap

class SigsharkSpec extends AnyFunSuite {

  test("J7/O1/O2/K5: interleaved transactions come out contiguous and time-ordered") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    def sctpFrame(src: Array[Byte], dst: Array[Byte], ssn: Int, payload: Array[Byte]) =
      ether(ipv4(132, src, dst, sctpData(3868, 3868, 1, ssn, 46L, payload)))
    def req(hbh: Long) = diameterMsg(request = true, 316, hbh, hbh, strAvp(263, s"s$hbh"))
    def ans(hbh: Long) = diameterMsg(request = false, 316, hbh, hbh, strAvp(263, s"s$hbh"))
    // two transactions, interleaved on the wire: t1 (frames 1,4), t2 (2,3)
    val pcap = pcapFile(Seq(
      (1000L, 0, sctpFrame(a, b, 1, req(7))),
      (1001L, 0, sctpFrame(a, b, 2, req(8))),
      (1002L, 0, sctpFrame(b, a, 3, ans(8))),
      (1003L, 0, sctpFrame(b, a, 4, ans(7)))))
    val dir = Files.createTempDirectory("graftsig")
    Files.write(dir.resolve("in.pcap"), pcap)

    val out = dir.resolve("out.pcap")
    val txs = Sigshark.run(SparkTest.spark, dir.toString + "/in.pcap", out)
    assert(txs.size == 2)
    // O2: global order restore
    assert(Sigshark.globalOrderFrames(txs) == Seq(1L, 2L, 3L, 4L))
    // O1: rewritten capture has transaction frames contiguous, ordered by
    // transaction start: t1 started first → (1,4) then t2 (2,3)
    val rewritten = Pcap.decodeFile("out", Files.readAllBytes(out))
    assert(rewritten.map(_.tsSec) == Seq(1000L, 1003L, 1001L, 1002L))
  }

  test("incomplete transactions dropped unless keepPartial") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    val pcap = pcapFile(Seq(
      (1000L, 0, ether(ipv4(132, a, b, sctpData(3868, 3868, 1, 1,
        46L, diameterMsg(request = true, 316, 9, 9, strAvp(263, "s9"))))))))
    val dir = Files.createTempDirectory("graftsig2")
    Files.write(dir.resolve("p.pcap"), pcap)
    val path = dir.toString + "/p.pcap"
    assert(Sigshark.diameterTransactions(SparkTest.spark, path).isEmpty)
    assert(Sigshark.diameterTransactions(SparkTest.spark, path, keepPartial = true).size == 1)
  }
}
