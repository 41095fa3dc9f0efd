package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CamelSpec extends AnyFunSuite {

  test("S5 tshark-json source: field arrays, hex tids, tid rule, op names") {
    val json =
      """[
        |  {"_source": {"layers": {
        |    "frame.number": ["1"], "frame.time_epoch": ["1700000000.123456789"],
        |    "ip.src": ["10.0.0.1"], "ip.dst": ["10.0.0.2"],
        |    "tcap.otid": ["0x1a2b"], "tcap.dtid": ["0x0000"],
        |    "camel.local": ["0"]}}},
        |  {"_source": {"layers": {
        |    "frame.number": ["2"], "frame.time_epoch": ["1700000001.5"],
        |    "ip.src": ["10.0.0.2"], "ip.dst": ["10.0.0.1"],
        |    "tcap.otid": ["0x9999"], "tcap.dtid": ["1a:2b"],
        |    "camel.local": ["31"]}}}
        |]""".stripMargin
    val dir = Files.createTempDirectory("graftcamel")
    Files.writeString(dir.resolve("cap.json"), json)
    val rows = graft.etl.Camel.records(SparkTest.spark, dir.toString + "/cap.json", "cap.pcap")
      .collect().sortBy(_.getAs[Long]("frame_number"))
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getAs[Long]("time_epoch") == 1700000000L)
    assert(r1.getAs[Int]("useconds_epoch") == 123456) // F16 clamp to 6 digits
    assert(r1.getAs[Long]("tcap_otid") == 0x1a2bL)
    assert(r1.getAs[String]("camel_op_name") == "initialDP")
    assert(r1.getAs[Long]("tcap_tid") == 0x1a2bL) // initialDP → otid
    val r2 = rows(1)
    assert(r2.getAs[Long]("tcap_dtid") == 0x1a2bL) // "1a:2b" colon form
    assert(r2.getAs[String]("camel_op_name") == "continue")
    assert(r2.getAs[Long]("tcap_tid") == 0x1a2bL) // non-initialDP → dtid
  }
}
