package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.{Http, Sip}
import graft.operators.Stateful.Piece

class HttpSipSpec extends AnyFunSuite {

  test("P10 http start detection") {
    assert(Http.isHttpStart("GET /x HTTP/1.1\r\nHost: a\r\n\r\n"))
    assert(Http.isHttpStart("HTTP/1.0 200 OK\r\n\r\n"))
    assert(!Http.isHttpStart("<xml>continuation</xml>"))
    assert(!Http.isHttpStart("NOTIFY sip:x SIP/2.0"))
  }

  test("F9/F10/F28 http parse: request uri synthesis + body typing") {
    val text = "POST /api/charge HTTP/1.1\r\nContent-Type: text/xml\r\nContent-Length: 11\r\n\r\n<a>hello</a>"
    val m = Http.parse("1", 1, 100, 0, "10.0.0.1", "10.0.0.2", "f.pcap", 1024, 8080, 5, 6, text).get
    assert(m.httpIsRequest && m.method == "POST")
    assert(m.uri == "http://10.0.0.2:8080/api/charge ") // trailing space = F10
    assert(m.contentType == "text/xml" && m.contentLength.contains(11))
    assert(m.bodyType == "content" && m.body == "<a>hello</a>")
    val res = Http.parse("2", 2, 100, 0, "10.0.0.2", "10.0.0.1", "f.pcap", 8080, 1024, 6, 5,
      "HTTP/1.1 200 OK\r\n\r\n").get
    assert(!res.httpIsRequest && res.responseCode.contains(200))
    assert(res.bodyType == "noContent") // F28
  }

  test("R3/D2 http flow reassembly: continuation append + retrans drop") {
    def seg(no: Long, seq: Long, ack: Long, text: String) =
      (Piece(no, 100, 0, "a", "b", "f", text.getBytes("UTF-8")), seq, ack)
    val out = Http.reassembleFlow(Seq(
      seg(1, 10, 20, "POST /x HTTP/1.1\r\nContent-Length: 10\r\n\r\n<a>"),
      seg(2, 11, 20, "</a><b></b>"), // continuation → appended
      seg(3, 11, 20, "</a><b></b>"), // same (seq,ack) → D2 dropped
      seg(4, 12, 21, "HTTP/1.1 404 NF\r\n\r\n")))
    assert(out.size == 2)
    assert(out.head.framesList == "1 2")
    assert(out.head.body == "<a></a><b></b>")
    assert(out(1).responseCode.contains(404))
  }

  test("J4 linking end-to-end over a synthetic capture") {
    val client = Array[Byte](10, 0, 0, 1)
    val server = Array[Byte](10, 0, 0, 2)
    def frame(src: Array[Byte], dst: Array[Byte], sp: Int, dp: Int, seq: Long,
        ack: Long, text: String) =
      ether(ipv4(6, src, dst, tcp(sp, dp, seq, ack, 24, text.getBytes("UTF-8"))))
    val pcap = pcapFile(Seq(
      (100L, 1, frame(client, server, 1111, 80, 1, 1, "GET /a HTTP/1.1\r\n\r\n")),
      (100L, 2, frame(server, client, 80, 1111, 1, 2, "HTTP/1.1 200 OK\r\n\r\n")),
      (101L, 3, frame(server, client, 80, 1111, 2, 2, "HTTP/1.1 500 ERR\r\n\r\n"))))
    val dir = Files.createTempDirectory("grafthttp")
    Files.write(dir.resolve("h.pcap"), pcap)
    val rows = Http.records(SparkTest.spark, dir.toString + "/*.pcap")
      .collect().sortBy(_.getAs[Long]("id"))
    assert(rows.length == 3)
    val req = rows.find(_.getAs[Boolean]("httpIsRequest")).get
    val lastRes = rows.filter(!_.getAs[Boolean]("httpIsRequest"))
      .maxBy(_.getAs[Long]("id"))
    // J4: request linked to the LAST response on the reversed tuple
    assert(req.getAs[Long]("http_response_in") == lastRes.getAs[Long]("id"))
    assert(lastRes.getAs[Int]("responseCode") == 500)
  }

  test("P12/F7/F8/F25 sip parse") {
    val invite = Seq(
      "INVITE sip:+5215512345678@host SIP/2.0",
      "Call-ID: abc123",
      "From: <sip:1234567890123@x>;tag=1", // 13 digits → F8 normalization
      "To: <tel:+5215598765432>",
      "v=0",
      "o=user1 777 1 IN IP4 1.2.3.4").mkString("\r\n")
    val m = Sip.parse("1", 1, 100, 0, "1.1.1.1", "2.2.2.2", "f", invite).get
    assert(m.method == "INVITE")
    assert(m.callId == "abc123")
    assert(m.fromUser == "567890123" && m.fromOriginal == "1234567890123")
    assert(m.toUser == "598765432" && m.toOriginal == "5215598765432") // F8 again
    assert(m.sdpOSessionId == "777" && m.sdpOVersion == "1")
    // status line variant
    val ok = Sip.parse("2", 2, 100, 0, "a", "b", "f", "SIP/2.0 183 Progress\r\nCall-ID: abc123").get
    assert(ok.statusCode.contains(183))
    // P12: non-whitelisted method rejected
    assert(Sip.parse("3", 3, 100, 0, "a", "b", "f", "NOTIFY sip:x SIP/2.0\r\n").isEmpty)
  }

  test("R5 defragment merges MF fragments by ip id") {
    def pkt(no: Long, mf: Boolean, payload: String) =
      graft.etl.Packet("f", no, 100, 0, "a", "b", 42, mf, 17, 5060, 5060, 0, 0, 0,
        payload.getBytes("UTF-8"))
    val out = Sip.defragment(Seq(pkt(1, mf = true, "INVITE sip:x SIP/"), pkt(2, mf = false, "2.0\r\n")))
    assert(out.size == 1)
    assert(out.head._1 == "1 2")
    assert(new String(out.head._3) == "INVITE sip:x SIP/2.0\r\n")
  }

  test("J6 cross-leg rewrite from configured IP sets") {
    val spark = SparkTest.spark
    import spark.implicits._
    val msgs = Seq(
      SipMsgRow("1", 1, "10.1.0.1", "INVITE", "alice", "alice", "bob", "bob", "777", "1"),
      SipMsgRow("2", 2, "10.2.0.1", "INVITE", "anon", "anon", "unknown", "unknown", "777", "1"))
      .toDF()
      .withColumnRenamed("srcIp", "srcIp")
    val out = Sip.crossLegCorrelate(msgs, legAIps = Set("10.1.0.1"), legBIps = Set("10.2.0.1"))
      .collect().map(r => (r.getAs[String]("framesList"), r.getAs[String]("fromUser"),
        r.getAs[String]("toUser"), r.getAs[String]("fromOriginal")))
    val legB = out.find(_._1 == "2").get
    assert(legB._2 == "alice" && legB._3 == "bob") // rewritten from leg A
    assert(legB._4 == "anon") // original preserved
  }
}

final case class SipMsgRow(framesList: String, firstFrame: Long, srcIp: String,
    method: String, fromUser: String, fromOriginal: String, toUser: String,
    toOriginal: String, sdpOSessionId: String, sdpOVersion: String)
