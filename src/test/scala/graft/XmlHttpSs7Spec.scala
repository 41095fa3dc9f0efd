package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{HttpSs7, XmlBody}

class XmlHttpSs7Spec extends AnyFunSuite {

  test("F11 xml parse with fixups, P13 whitelist, F12 first-match") {
    val e = XmlBody.parse(
      """<mo-acr-request xmlns="urn:x"><a><msisdn>52155&12</msisdn></a><msisdn>other</msisdn></mo-acr-request>""").get
    assert(XmlBody.rootType(e) == "mo-acr-request")
    assert(XmlBody.OcsOperationTypes.contains(XmlBody.rootType(e)))
    assert(!XmlBody.OcsOperationTypes.contains("initialDP"))
    // pre-order first match takes the deepest-first branch occurrence
    assert(XmlBody.findFirst(e, "msisdn").map(XmlBody.htmlUnescape).contains("52155&12"))
    assert(XmlBody.parse("not xml <<<").isEmpty)
  }

  test("F13/F14/F18 scalar helpers") {
    assert(XmlBody.htmlUnescape("a&amp;b&lt;c") == "a&b<c")
    assert(XmlBody.truncate32("x" * 40) == "x" * 29 + "...")
    assert(XmlBody.truncate32("short") == "short")
    assert(XmlBody.boolFromString(" TRUE "))
    assert(!XmlBody.boolFromString("yes"))
  }

  test("F30 smpp-xml msisdn rule + diameter-xml null result code") {
    val deliver = XmlBody.parse(
      "<smpp><commandId>5</commandId><sourceAddress>111</sourceAddress><destAddress>222</destAddress></smpp>").get
    assert(XmlBody.smppXmlMsisdn(deliver).contains("111"))
    val submit = XmlBody.parse(
      "<smpp><commandId>4</commandId><sourceAddress>111</sourceAddress><destAddress>222</destAddress></smpp>").get
    assert(XmlBody.smppXmlMsisdn(submit).contains("222"))
    val diam = XmlBody.parse("<diameter><resultCode>null</resultCode></diameter>").get
    assert(XmlBody.diamXmlResultCode(diam).contains(0L))
  }

  test("R4/J5 pair by request.ack == response.seq with bidirectional fill") {
    val spark = SparkTest.spark
    import spark.implicits._
    val msgs = Seq(
      // req: ack 100 → pairs with res seq 100
      ("f", "10.0.0.1", 1111, "10.0.0.2", 80, 55L, 100L, true, "1", 1L, "5215", ""),
      ("f", "10.0.0.2", 80, "10.0.0.1", 1111, 100L, 56L, false, "2", 2L, "", "imsi9"),
      // unpaired request (ack 999)
      ("f", "10.0.0.1", 1111, "10.0.0.2", 80, 57L, 999L, true, "3", 3L, "5299", ""))
      .toDF("pcapFilename", "srcIp", "srcPort", "dstIp", "dstPort",
        "tcpSequence", "tcpAcknowledge", "httpIsRequest", "framesList", "firstFrame",
        "msisdn", "imsi")
    val out = HttpSs7.pairAndEnrich(msgs, Seq("msisdn", "imsi")).collect()
    assert(out.length == 2)
    val linked = out.find(_.getAs[Boolean]("matched")).get
    // J5 bidirectional exchange
    assert(linked.getAs[String]("q_msisdn") == "5215" && linked.getAs[String]("r_msisdn") == "5215")
    assert(linked.getAs[String]("q_imsi") == "imsi9" && linked.getAs[String]("r_imsi") == "imsi9")
    val unlinked = out.find(!_.getAs[Boolean]("matched")).get
    assert(unlinked.getAs[String]("link_state") == "unlinked")
    assert(unlinked.getAs[String]("q_msisdn") == "5299")
  }
}
