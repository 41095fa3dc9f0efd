package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Sigshark, TcapPkt}
import graft.sources.TsharkCsv

/** S6 compat: the reference tool's 21-column tshark CSV extract drives
  * the same TCAP transaction machine as the native pcap path. */
class TsharkCsvSpec extends AnyFunSuite {

  // column order: encap, frame, epoch, ip_src, ip_dst, cg_ssn, cg_digits,
  // cd_ssn, cd_digits, sccp_segs, otid, dtid, begin, continue, end,
  // abort, dia_request, dia_hbh, dia_e2e, sctp_frags, sctp
  private def row(frame: Int, epoch: String, messCol: Int, otid: String, dtid: String,
      cgSsn: String = "6", cgGt: String = "491710001", cdSsn: String = "8",
      cdGt: String = "491710002", encap: String = "", sctp: String = "1",
      segs: String = "", frags: String = ""): String = {
    val f = Array.fill(21)("")
    f(0) = encap; f(1) = frame.toString; f(2) = epoch
    f(5) = cgSsn; f(6) = cgGt; f(7) = cdSsn; f(8) = cdGt
    f(9) = segs; f(10) = otid; f(11) = dtid
    if (messCol >= 0) f(messCol) = "1"
    f(19) = frags; f(20) = sctp
    f.mkString(",")
  }

  private def writeCsv(lines: Seq[String]): String = {
    val p = java.nio.file.Files.createTempFile("tshark", ".csv")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("begin/continue/end transaction closes with the tool's key and 0-based frames") {
    val spark = SparkTest.spark
    val csv = writeCsv(Seq(
      row(1, "100.000001", 12, "1a2b", ""), // begin, otid 0x1a2b
      // continue from the far end: calling/called swapped, dtid = begin's otid
      row(2, "100.500000", 13, "00c4", "1a2b",
        cgSsn = "8", cgGt = "491710002", cdSsn = "6", cdGt = "491710001"),
      row(3, "101.250000", 14, "", "00c4"), // end via the alias map
      row(4, "102.0", 12, "ffff", "", sctp = "", encap = "7"))) // unsupported encap: dropped
    val txs = TsharkCsv.tcapTransactions(spark, csv).collect()
    assert(txs.length === 1)
    assert(txs.head.key === s"6_491710001_${0x1a2b}")
    assert(txs.head.startTsSec === 100L && txs.head.startUsec === 1)
    assert(txs.head.frames === Seq(0L, 1L, 2L))
  }

  test("matches Sigshark.sessionize on the equivalent TcapPkt rows exactly") {
    val spark = SparkTest.spark
    import spark.implicits._
    val csv = writeCsv(Seq(
      row(1, "10.000000", 12, "0a", ""),
      row(2, "10.100000", 14, "", "0a"), // direct end via dkey needs cd = cg of begin
      row(3, "11.000000", 12, "0b", ""),
      row(4, "12.000000", 13, "0b", "0c"))) // continue, stays open
    val viaCsv = TsharkCsv.tcapTransactions(spark, csv, keepPartial = true, captureName = "c")
      .collect().sortBy(_.key).toSeq
    val pkts = Seq(
      TcapPkt("c", 0, 10, 0, "begin", 0x0a, 0, 6, "491710001", 8, "491710002"),
      TcapPkt("c", 1, 10, 100000, "end", 0, 0x0a, 6, "491710001", 8, "491710002"),
      TcapPkt("c", 2, 11, 0, "begin", 0x0b, 0, 6, "491710001", 8, "491710002"),
      TcapPkt("c", 3, 12, 0, "continue", 0x0b, 0x0c, 6, "491710001", 8, "491710002"))
    val direct = Sigshark.sessionize(pkts.toDS(), keepPartial = true)
      .collect().sortBy(_.key).toSeq
    assert(viaCsv === direct && viaCsv.nonEmpty)
  }

  test("multi-chunk rows fail loudly with the tool's --flatten remedy") {
    val spark = SparkTest.spark
    val f = Array.fill(21)("")
    f(1) = "1"; f(2) = "5.0"; f(12) = "1"; f(14) = "1"; f(20) = "1"
    val csv = writeCsv(Seq(f.mkString(",")))
    val e = intercept[org.apache.spark.SparkException] {
      TsharkCsv.tcapTransactions(spark, csv).collect()
    }
    assert(e.getMessage.contains("flatten") ||
      Option(e.getCause).exists(_.getMessage.contains("flatten")))
  }

  test("random CSV garbage parses to empty or fails only through the loud guards") {
    val spark = SparkTest.spark
    val rnd = new scala.util.Random(13)
    for (round <- 0 until 8) {
      val lines = (0 until 20).map { _ =>
        (0 until 21).map(_ =>
          rnd.nextInt(4) match {
            case 0 => ""
            case 1 => rnd.nextInt(100).toString
            case 2 => rnd.alphanumeric.take(rnd.nextInt(6)).mkString
            case _ => f"${rnd.nextInt(1 << 16)}%x"
          }).mkString(",")
      }
      val csv = writeCsv(lines)
      try TsharkCsv.tcapTransactions(spark, csv).collect()
      catch {
        // only the documented failure modes may surface: the
        // multi-chunk --flatten guard and unparseable numeric fields
        case e: org.apache.spark.SparkException =>
          val msg = e.getMessage + Option(e.getCause).map(_.toString).getOrElse("")
          assert(msg.contains("flatten") || msg.contains("NumberFormat"),
            s"unexpected failure class: $e")
      }
    }
  }

  test("sccp segment / sctp fragment lists expand into the frame list like the tool") {
    val spark = SparkTest.spark
    val csv = writeCsv(Seq(
      row(1, "100.0", 12, "aa", ""), // begin, frame 0
      // reassembled end: the row is frame 5 but sigshark.py:460-466
      // replaces it with the segs+frags lists, each int(f)-1
      row(5, "101.0", 14, "", "aa", cgSsn = "8", cgGt = "491710002",
        cdSsn = "6", cdGt = "491710001", segs = "3-4", frags = "5")))
    val txs = TsharkCsv.tcapTransactions(spark, csv).collect()
    assert(txs.length === 1)
    assert(txs.head.frames === Seq(0L, 2L, 3L, 4L))
  }

  test("colon-separated hex tids and missing fraction parse") {
    val spark = SparkTest.spark
    val csv = writeCsv(Seq(
      row(1, "42", 12, "1a:2b:00:c8", ""),
      // end addressed back at the begin's calling party
      row(2, "43", 14, "", "1a:2b:00:c8",
        cgSsn = "8", cgGt = "491710002", cdSsn = "6", cdGt = "491710001")))
    val txs = TsharkCsv.tcapTransactions(spark, csv).collect()
    assert(txs.length === 1)
    assert(txs.head.key.endsWith(s"_${0x1a2b00c8L}"))
    assert(txs.head.startUsec === 0)
  }
}
