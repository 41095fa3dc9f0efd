package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.{HttpOcs, HttpSs7}

/** Golden synthetic-capture tests for the two largest reference
  * workloads: http_ss7 and http_ocs end-to-end from pcap bytes to the
  * models.py table rows (per-operation-type field extraction + R4
  * pairing + bidirectional enrichment).
  */
class HttpSs7OcsPipelineSpec extends AnyFunSuite {

  private val client = Array[Byte](10, 0, 0, 1)
  private val server = Array[Byte](10, 0, 0, 2)

  private def frame(src: Array[Byte], dst: Array[Byte], sp: Int, dp: Int,
      seq: Long, ack: Long, text: String) =
    ether(ipv4(6, src, dst, tcp(sp, dp, seq, ack, 24, text.getBytes("UTF-8"))))

  private def post(body: String) =
    s"POST /x HTTP/1.1\r\nContent-Type: text/xml\r\nContent-Length: ${body.length}\r\n\r\n$body"

  private def ok(body: String) =
    s"HTTP/1.1 200 OK\r\nContent-Length: ${body.length}\r\n\r\n$body"

  test("http_ss7 end-to-end: smsmo extraction, pairing, bidirectional fill") {
    val reqBody = """<smsmo><orig a="1">52&amp;111</orig><dest a="1">""" +
      "9" * 40 + """</dest><msc a="1">msc1</msc><imsi>712</imsi>""" +
      """<smsSubmit><udhi>true</udhi></smsSubmit><sessionId>s77</sessionId></smsmo>"""
    val resBody = "<error><text>ok</text></error>"
    val pcap = pcapFile(Seq(
      (100L, 1, frame(client, server, 1111, 80, 1000, 500, post(reqBody))),
      (100L, 2, frame(server, client, 80, 1111, 500, 1040, ok(resBody))),
      // unpaired request on a second flow (ack matches nothing)
      (101L, 3, frame(client, server, 2222, 80, 7000, 999,
        post("<alertSC><msisdn a=\"1\">5299</msisdn></alertSC>")))))
    val dir = Files.createTempDirectory("graftss7")
    Files.write(dir.resolve("s.pcap"), pcap)
    val rows = HttpSs7.records(SparkTest.spark, dir.toString + "/*.pcap").collect()
    assert(rows.length == 3)

    val req = rows.find(r => r.getAs[String]("type") == "smsmo").get
    assert(req.getAs[Boolean]("http_is_request"))
    assert(req.getAs[String]("http_request_method") == "POST")
    assert(req.getAs[String]("http_request_uri") == "http://10.0.0.2:80/x ")
    assert(req.getAs[String]("msisdn_orig") == "52&111") // F13 unescape
    assert(req.getAs[String]("msisdn_dest") == "9" * 29 + "...") // F14 truncate
    assert(req.getAs[String]("msc") == "msc1")
    assert(req.getAs[String]("imsi") == "712")
    assert(req.getAs[String]("session_id") == "s77")
    assert(req.getAs[Boolean]("udhi"))
    assert(req.getAs[String]("link_state") == "linked")

    val res = rows.find(r => r.getAs[String]("type") == "error").get
    assert(!res.getAs[Boolean]("http_is_request"))
    assert(res.getAs[Int]("http_response_code") == 200)
    assert(res.getAs[String]("text") == "ok")
    // J5 bidirectional fill: response inherits the request's subscriber ids
    assert(res.getAs[String]("msisdn_orig") == "52&111")
    assert(res.getAs[String]("imsi") == "712")
    // J4/K2: the request points at its response's engine id
    assert(req.getAs[Long]("http_response_in") == res.getAs[Long]("id"))
    assert(res.isNullAt(res.fieldIndex("http_response_in")))

    val alone = rows.find(r => r.getAs[String]("type") == "alertSC").get
    assert(alone.getAs[String]("link_state") == "unlinked")
    assert(alone.getAs[String]("msisdn_orig") == "5299")
    assert(alone.isNullAt(alone.fieldIndex("http_response_in")))
  }

  test("http_ss7: sriForSm fields + #text attribute gate") {
    // msisdn WITHOUT attributes → xmltodict ["#text"] raises → null
    val body = """<sriForSm><sccpCdAdr np="1">cd9</sccpCdAdr>""" +
      """<msisdn>5215</msisdn><imsi>734</imsi><msc np="1">m3</msc></sriForSm>"""
    val pcap = pcapFile(Seq(
      (100L, 1, frame(client, server, 1111, 80, 1, 99, post(body)))))
    val dir = Files.createTempDirectory("graftss7b")
    Files.write(dir.resolve("s.pcap"), pcap)
    val rows = HttpSs7.records(SparkTest.spark, dir.toString + "/*.pcap").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("type") == "sriForSm")
    assert(r.getAs[String]("sccp_cd_adr") == "cd9")
    assert(r.isNullAt(r.fieldIndex("msisdn_orig"))) // attribute gate
    assert(r.getAs[String]("imsi") == "734")
    assert(r.getAs[String]("msc") == "m3")
  }

  test("http_ocs end-to-end: whitelist gate, generic extraction, fill") {
    val reqBody = """<mo-idp-request id="5"><cdpa>cd1</cdpa><msisdn>52111</msisdn>""" +
      """<periodduration>30</periodduration><callactive>TRUE</callactive>""" +
      """<starttime>t1</starttime><starttime>t2</starttime><endtime>te</endtime>""" +
      """<status_code>7</status_code><mcc>334</mcc><mnc>20</mnc>""" +
      """<calling>5222</calling></mo-idp-request>"""
    val resBody = """<mo-idp-response id="5"><result>1</result>""" +
      """<phone>5333</phone></mo-idp-response>"""
    val dropped = post("<notAnOp><msisdn>x</msisdn></notAnOp>")
    val noContent = "POST /x HTTP/1.1\r\nHost: a\r\n\r\n"
    val pcap = pcapFile(Seq(
      (100L, 1, frame(client, server, 1111, 80, 1000, 500, post(reqBody))),
      (100L, 2, frame(server, client, 80, 1111, 500, 1040, ok(resBody))),
      (101L, 3, frame(client, server, 2222, 80, 7000, 999, dropped)),
      (102L, 4, frame(client, server, 3333, 80, 8000, 888, noContent))))
    val dir = Files.createTempDirectory("graftocs")
    Files.write(dir.resolve("o.pcap"), pcap)
    val rows = HttpOcs.records(SparkTest.spark, dir.toString + "/*.pcap").collect()
    // whitelist miss dropped; noContent kept
    assert(rows.length == 3)

    val req = rows.find(r => r.getAs[String]("type") == "mo-idp-request").get
    assert(req.getAs[Int]("operation_id") == 5)
    assert(req.getAs[String]("cdpa") == "cd1")
    assert(req.getAs[Int]("period_duration") == 30)
    assert(req.getAs[Boolean]("call_active")) // F18: "TRUE" → true
    assert(req.getAs[String]("start_time") == "t1") // first occurrence wins
    assert(req.getAs[String]("end_time") == "te")
    assert(req.getAs[Int]("status_code") == 7)
    assert(req.getAs[Int]("mcc") == 334 && req.getAs[Int]("mnc") == 20)

    val res = rows.find(r => r.getAs[String]("type") == "mo-idp-response").get
    assert(res.getAs[Int]("result") == 1)
    // J5 fill: msisdn/calling flow req→res, phone flows res→req
    assert(res.getAs[String]("msisdn") == "52111")
    assert(res.getAs[String]("calling") == "5222")
    assert(req.getAs[String]("phone") == "5333")
    assert(req.getAs[Long]("http_response_in") == res.getAs[Long]("id"))

    val nc = rows.find(r => r.getAs[String]("type") == "noContent").get
    assert(nc.isNullAt(nc.fieldIndex("msisdn")))
  }
}
