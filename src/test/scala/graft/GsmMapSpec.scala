package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.{GsmMap, SccpMsg}

class GsmMapSpec extends AnyFunSuite {

  private def ber(tag: Int, value: Array[Byte]): Array[Byte] = {
    require(value.length < 128)
    cat(Array(tag.toByte, value.length.toByte), value)
  }

  test("P9 m3ua transfer-DATA unwrap with SI gate") {
    val userData = Array[Byte](9, 1, 2, 3)
    val pd = cat(be32(101), be32(202), Array[Byte](3, 2, 0, 0), userData)
    val param = cat(be16(0x0210), be16(4 + pd.length), pd)
    val msg = cat(Array[Byte](1, 0, 1, 1), be32(8L + param.length), param)
    val Some((opc, dpc, si, data)) = GsmMap.m3uaData(msg)
    assert(opc == 101 && dpc == 202 && si == 3)
    assert(data.sameElements(userData))
    // non-transfer class rejected
    val bad = msg.clone(); bad(2) = 3
    assert(GsmMap.m3uaData(bad).isEmpty)
  }

  test("P9 sccp UDT parse extracts data part") {
    val called = Array[Byte](0x12, 0x34)
    val calling = Array[Byte](0x56)
    val data = Array[Byte](0x62, 0x00)
    // UDT: type, pclass, ptr1, ptr2, ptr3 then parts
    val b = cat(Array[Byte](9, 0),
      Array[Byte](3, (3 + called.length).toByte, (3 + called.length + calling.length).toByte),
      Array(called.length.toByte), called,
      Array(calling.length.toByte), calling,
      Array(data.length.toByte), data)
    val m = GsmMap.sccpParse(7, 8, b).get
    assert(m.sccpType == 9 && m.opc == 7 && m.dpc == 8)
    assert(m.data.sameElements(data))
    assert(m.segmentation.isEmpty)
  }

  test("R6 sccp segmentation reassembly") {
    def seg(first: Boolean, remaining: Int, data: Array[Byte]) =
      SccpMsg(1, 2, 17, data, Some((first, remaining, 0xabcdefL)))
    val out = GsmMap.reassembleSegments(Seq(
      seg(first = true, 2, Array[Byte](1, 2)),
      seg(first = false, 1, Array[Byte](3)),
      seg(first = false, 0, Array[Byte](4, 5))))
    assert(out.get.sameElements(Array[Byte](1, 2, 3, 4, 5)))
    assert(GsmMap.reassembleSegments(Seq(seg(first = true, 2, Array[Byte](1)))).isEmpty)
  }

  test("F26/F12 tcap begin with invoke: tid, opcode, imsi heuristic") {
    // IMSI 123456789012345 as TBCD (odd → trailing f nibble)
    val imsiTbcd = Array(0x21, 0x43, 0x65, 0x87, 0x09, 0x21, 0x43, 0xf5).map(_.toByte)
    val invoke = ber(0xa1, cat(
      ber(0x02, Array[Byte](1)), // invoke id
      ber(0x02, Array[Byte](45)), // opcode: sendRoutingInfoForSM
      ber(0x30, ber(0x04, imsiTbcd)))) // param sequence with octet string
    val begin = ber(0x62, cat(
      ber(0x48, Array[Byte](0x11, 0x22)), // otid
      ber(0x6c, invoke)))
    val t = GsmMap.tcapParse(begin).get
    assert(t.messType == "begin")
    assert(t.otid == 0x1122L)
    assert(t.tcapTid == 0x1122L) // F26: begin → otid
    assert(t.gsmComponent == 1 && t.gsmOpCode == 45)
    assert(t.imsi == "123456789012345")
  }

  test("F27 tcap abort fallback: dtid from tag 0x49") {
    val abort = ber(0x67, ber(0x49, Array[Byte](0x00, 0x33, 0x44)))
    val t = GsmMap.tcapParse(abort).get
    assert(t.messType == "abort")
    assert(t.dtid == 0x3344L)
    assert(t.tcapTid == 0x3344L) // F26: abort → dtid
  }
}
