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

  test("TCAP begin/continue/end with tid-alias map → transaction-sorted pcap") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    val gtA = sccpAddrGt(8, Array(0x21, 0x43).map(_.toByte)) // GT "1234"
    val gtB = sccpAddrGt(6, Array(0x65, 0x87).map(_.toByte)) // GT "5678"
    val gtC = sccpAddrGt(8, Array(0x99, 0x09).map(_.toByte)) // GT "9990"
    def tcapOverM3ua(src: Array[Byte], dst: Array[Byte], calling: Array[Byte],
        called: Array[Byte], tcap: Array[Byte]) =
      ether(ipv4(132, src, dst, sctpData(2905, 2905, 0, 0, 3L,
        m3uaTransfer(101, 202, sccpUdt(called, calling, tcap)))))
    val begin1 = ber(0x62, ber(0x48, Array[Byte](0x11)))
    val begin2 = ber(0x62, ber(0x48, Array[Byte](0x33)))
    val cont1 = ber(0x65, cat(ber(0x48, Array[Byte](0x22)), ber(0x49, Array[Byte](0x11))))
    val end2 = ber(0x64, ber(0x49, Array[Byte](0x33)))
    // ends tx1 via the alias: dtid 0x22 was never a begin key, only the
    // continue's otid — close must go through map_tids (`sigshark.py:503-507`)
    val end1 = ber(0x67, ber(0x49, Array[Byte](0x22)))
    val orphan = ber(0x65, cat(ber(0x48, Array[Byte](0x77)), ber(0x49, Array[Byte](0x78))))
    // interleaved on the wire: tx1 frames (1,3,5), tx2 frames (2,4), orphan 6
    val pcap = pcapFile(Seq(
      (2000L, 0, tcapOverM3ua(a, b, gtA, gtB, begin1)),
      (2001L, 0, tcapOverM3ua(a, b, gtC, gtB, begin2)),
      (2002L, 0, tcapOverM3ua(b, a, gtB, gtA, cont1)),
      (2003L, 0, tcapOverM3ua(b, a, gtB, gtC, end2)),
      (2004L, 0, tcapOverM3ua(a, b, gtA, gtB, end1)),
      (2005L, 0, tcapOverM3ua(a, b, gtA, gtB, orphan))))
    val dir = Files.createTempDirectory("graftsigtcap")
    Files.write(dir.resolve("in.pcap"), pcap)
    val path = dir.toString + "/in.pcap"

    val out = dir.resolve("out.pcap")
    val txs = Sigshark.runTcap(SparkTest.spark, path, out)
    assert(txs.size == 2)
    val byKey = txs.map(t => t.key -> t).toMap
    // begin key = cgssn_cgpa_otid of the BEGIN packet
    assert(byKey("8_1234_17").frames == Seq(1L, 3L, 5L))
    assert(byKey("8_9990_51").frames == Seq(2L, 4L))
    // orphan continue dropped; kept under keepPartial (--incomplete)
    assert(Sigshark.tcapTransactions(SparkTest.spark, path, keepPartial = true)
      .collect().length == 3)
    // O1: transaction-contiguous, start-ordered rewrite
    val rewritten = Pcap.decodeFile("out", Files.readAllBytes(out))
    assert(rewritten.map(_.tsSec) == Seq(2000L, 2002L, 2004L, 2001L, 2003L))
  }

  test("--exclude-ip and display-filter compose into the TCAP scan") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](172.toByte, 16, 0, 2)
    val gtA = sccpAddrGt(8, Array(0x21, 0x43).map(_.toByte))
    val gtB = sccpAddrGt(6, Array(0x65, 0x87).map(_.toByte))
    def tcapOverM3ua(src: Array[Byte], dst: Array[Byte], calling: Array[Byte],
        called: Array[Byte], tcap: Array[Byte]) =
      ether(ipv4(132, src, dst, sctpData(2905, 2905, 0, 0, 3L,
        m3uaTransfer(101, 202, sccpUdt(called, calling, tcap)))))
    val begin = ber(0x62, ber(0x48, Array[Byte](0x11)))
    val end = ber(0x64, ber(0x49, Array[Byte](0x11)))
    val pcap = pcapFile(Seq(
      (3000L, 0, tcapOverM3ua(a, b, gtA, gtB, begin)),
      (3001L, 0, tcapOverM3ua(b, a, gtB, gtA, end))))
    val dir = Files.createTempDirectory("graftsigex")
    Files.write(dir.resolve("in.pcap"), pcap)
    val path = dir.toString + "/in.pcap"

    assert(Sigshark.tcapTransactions(SparkTest.spark, path).count() == 1)
    // P14: either endpoint in an excluded block removes the packets
    assert(Sigshark.tcapTransactions(SparkTest.spark, path,
      excludeCidrs = Seq("172.16.0.0/12")).count() == 0)
    assert(Sigshark.tcapTransactions(SparkTest.spark, path,
      excludeCidrs = Seq("192.168.0.0/16")).count() == 1)
    // display filter drops the end → transaction never completes
    assert(Sigshark.tcapTransactions(SparkTest.spark, path,
      displayFilter = Some("messType = 'begin'")).count() == 0)
    assert(Sigshark.tcapTransactions(SparkTest.spark, path, keepPartial = true,
      displayFilter = Some("messType = 'begin'")).count() == 1)
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
    assert(Sigshark.diameterTransactions(SparkTest.spark, path, keepPartial = true).count() == 1)
  }

  test("streamed tool write is byte-identical to the in-memory path (separators on)") {
    // many interleaved transactions so the output order has real gaps —
    // the bounded-memory join+sort+toLocalIterator path (round-9 verdict
    // item: no frames.collect()) must produce EXACTLY the bytes of the
    // in-memory transactionSortedPcap, separator records included
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    def sctpFrame(src: Array[Byte], dst: Array[Byte], ssn: Int, payload: Array[Byte]) =
      ether(ipv4(132, src, dst, sctpData(3868, 3868, 1, ssn, 46L, payload)))
    def req(hbh: Long) = diameterMsg(request = true, 316, hbh, hbh, strAvp(263, s"s$hbh"))
    def ans(hbh: Long) = diameterMsg(request = false, 316, hbh, hbh, strAvp(263, s"s$hbh"))
    val n = 20
    // frames 1..n are requests 1..n, frames n+1..2n answers in REVERSE →
    // transaction i owns frames (i, 2n+1-i): maximally non-contiguous
    val recs = (1 to n).map(i => (1000L + i, 0, sctpFrame(a, b, i, req(i.toLong)))) ++
      (1 to n).map(i => (2000L + i, 0, sctpFrame(b, a, i, ans((n + 1 - i).toLong))))
    val pcap = pcapFile(recs)
    val dir = Files.createTempDirectory("graftsigstream")
    Files.write(dir.resolve("in.pcap"), pcap)
    val path = dir.toString + "/in.pcap"

    val txs = Sigshark.diameterTransactions(SparkTest.spark, path).collect().toSeq
    assert(txs.size == n)
    val frames = Pcap.frames(SparkTest.spark, path).collect().toSeq
    val out = dir.resolve("out.pcap")
    Sigshark.run(SparkTest.spark, path, out)
    val inMemory = Sigshark.transactionSortedPcap(frames, txs, frames.head.dlt)
    assert(java.util.Arrays.equals(Files.readAllBytes(out), inMemory))

    // separator records through the distributed path: a TCAP capture
    // with interleaved transactions → runTcap(separators = true)
    val gtA = sccpAddrGt(8, Array(0x21, 0x43).map(_.toByte))
    val gtB = sccpAddrGt(6, Array(0x65, 0x87).map(_.toByte))
    val gtC = sccpAddrGt(8, Array(0x99, 0x09).map(_.toByte))
    def tcapOverM3ua(src: Array[Byte], dst: Array[Byte], calling: Array[Byte],
        called: Array[Byte], tcap: Array[Byte]) =
      ether(ipv4(132, src, dst, sctpData(2905, 2905, 0, 0, 3L,
        m3uaTransfer(101, 202, sccpUdt(called, calling, tcap)))))
    val tpcap = pcapFile(Seq(
      (2000L, 0, tcapOverM3ua(a, b, gtA, gtB, ber(0x62, ber(0x48, Array[Byte](0x11))))),
      (2001L, 0, tcapOverM3ua(a, b, gtC, gtB, ber(0x62, ber(0x48, Array[Byte](0x33))))),
      (2002L, 0, tcapOverM3ua(b, a, gtB, gtA, ber(0x64, ber(0x49, Array[Byte](0x11))))),
      (2003L, 0, tcapOverM3ua(b, a, gtB, gtC, ber(0x64, ber(0x49, Array[Byte](0x33)))))))
    Files.write(dir.resolve("t.pcap"), tpcap)
    val tpath = dir.toString + "/t.pcap"
    val tout = dir.resolve("tout.pcap")
    val ttxs = Sigshark.runTcap(SparkTest.spark, tpath, tout, separators = true)
    assert(ttxs.size == 2)
    val tframes = Pcap.frames(SparkTest.spark, tpath).collect().toSeq
    val tInMemory = Sigshark.transactionSortedPcap(tframes, ttxs, tframes.head.dlt,
      separators = true)
    // interleaved txs → frame order (1,3),(2,4): a real gap, so the
    // in-memory bytes DO contain separator records the A/B must match
    assert(tInMemory.length > tframes.map(_.data.length + 16).sum + 24)
    assert(java.util.Arrays.equals(Files.readAllBytes(tout), tInMemory))
  }
}
