package graft.etl

import graft.functions.BinaryCodecs._

/** SS7 GSM-MAP chain (SURVEY §2: P9, R6, F2, F3, F12, F26, F27;
  * `gsm_map.py`): M3UA → MTP3 → SCCP (UDT/XUDT + segmentation) → TCAP
  * (targeted BER walk, not a full MAP grammar — SURVEY §7.3 #3).
  */
/** One SCCP party address (Q.713 §3.4): subsystem number + global-title
  * digit string (empty when the address carries no SSN / GT). */
final case class SccpAddr(ssn: Int, gt: String)

final case class SccpMsg(
    opc: Int,
    dpc: Int,
    sccpType: Int, // 9=UDT, 17=XUDT, 18=XUDTS
    data: Array[Byte],
    // XUDT segmentation (R6): Some((isFirst, remaining, ref)) when present
    segmentation: Option[(Boolean, Int, Long)],
    called: SccpAddr = SccpAddr(0, ""),
    calling: SccpAddr = SccpAddr(0, ""))

final case class TcapMsg(
    messType: String,
    otid: Long,
    dtid: Long,
    tcapTid: Long,
    gsmComponent: Int,
    gsmOpCode: Int,
    gsmErrorCode: Int,
    imsi: String,
    msisdn: String)

object GsmMap {

  final val PpidM3ua = 3L

  /** Minimal BER TLV reader (definite lengths, short + long form). */
  object Ber {
    /** (tag, valueOffset, valueLen, nextOffset) or null on malformed. */
    def tlv(b: Array[Byte], off: Int, end: Int): (Int, Int, Int, Int) = {
      if (off + 2 > end) return null
      var o = off
      var tag = b(o) & 0xff
      o += 1
      if ((tag & 0x1f) == 0x1f) { // multi-byte tag (not used by our fields)
        while (o < end && (b(o) & 0x80) != 0) o += 1
        if (o >= end) return null
        o += 1
      }
      if (o >= end) return null
      var len = b(o) & 0xff
      o += 1
      if ((len & 0x80) != 0) {
        val n = len & 0x7f
        if (n == 0 || n > 4 || o + n > end) return null
        len = 0
        var i = 0
        while (i < n) { len = (len << 8) | (b(o + i) & 0xff); i += 1 }
        o += n
      }
      if (o + len > end) return null
      (tag, o, len, o + len)
    }

    /** F12: pre-order first match of `tag` (descending into constructed
      * TLVs), mirroring the reference's recursive `get_value`
      * (`gsm_map.py:28-54`). */
    def findFirst(b: Array[Byte], off: Int, end: Int, tag: Int): Option[(Int, Int)] = {
      var o = off
      while (o < end) {
        val t = tlv(b, o, end)
        if (t == null) return None
        val (tg, vOff, vLen, next) = t
        if (tg == tag) return Some((vOff, vLen))
        if ((tg & 0x20) != 0) { // constructed → descend
          val inner = findFirst(b, vOff, vOff + vLen, tag)
          if (inner.isDefined) return inner
        }
        o = next
      }
      None
    }
  }

  /** P9: M3UA transfer-DATA → MTP3-equivalent protocol-data payload.
    * Returns (opc, dpc, si, userData) when version 1, class 1, type 1 and
    * a Protocol Data parameter (0x0210) is present
    * (`gsm_map.py:128-177`). */
  def m3uaData(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 8 || b(0) != 1) return None
    if ((b(2) & 0xff) != 1 || (b(3) & 0xff) != 1) return None // class/type
    var off = 8
    while (off + 4 <= b.length) {
      val tag = beInt(b, off, 2)
      val len = beInt(b, off + 2, 2)
      if (len < 4 || off + len > b.length) return None
      if (tag == 0x0210 && len >= 16) {
        val opc = beInt(b, off + 4, 4)
        val dpc = beInt(b, off + 8, 4)
        val si = b(off + 12) & 0xff
        val data = java.util.Arrays.copyOfRange(b, off + 16, off + len)
        return if (si == 3) Some((opc, dpc, si, data)) else None // SCCP only
      }
      off += ((len + 3) / 4) * 4
    }
    None
  }

  /** MTP3-on-the-wire (DLT 141, `gsm_map.py:15-20,161-177`): the frame IS
    * the MTP3 message — SIO byte, 4-byte little-endian routing label
    * (dpc = low 14 bits, opc = next 14), SCCP from offset 5. Gated on the
    * reference's `service_inf & 3 == 3` SCCP check. */
  def mtp3Data(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 6 || (b(0) & 3) != 3) return None
    val label = leLong(b, 1, 4)
    val opc = ((label & 0x0FFFC000L) >> 14).toInt
    val dpc = (label & 0x3FFFL).toInt
    Some((opc, dpc, java.util.Arrays.copyOfRange(b, 5, b.length)))
  }

  /** Q.713 party-address decode: address-indicator bit 0 = point code
    * present (skip 2), bit 1 = SSN present, GTI in bits 2-5. GT digits are
    * nibble-swapped BCD after the GT header (GTI 1: NAI; GTI 2: TT;
    * GTI 3: TT+NP/ES; GTI 4: TT+NP/ES+NAI). Sigshark keys transactions on
    * (ssn, gt) pairs (`sigshark.py:471-478` cgssn/cgpa/cdssn/cdpa). */
  def sccpAddr(b: Array[Byte]): SccpAddr = {
    if (b.length < 1) return SccpAddr(0, "")
    val ai = b(0) & 0xff
    var o = 1
    if ((ai & 0x01) != 0) o += 2 // point code
    var ssn = 0
    if ((ai & 0x02) != 0 && o < b.length) { ssn = b(o) & 0xff; o += 1 }
    val gti = (ai >> 2) & 0x0f
    val gtHeader = gti match {
      case 1 | 2 => 1
      case 3 => 2
      case 4 => 3
      case _ => -1
    }
    val gt =
      if (gtHeader < 0 || o + gtHeader >= b.length) ""
      else bcdSwapDecode(java.util.Arrays.copyOfRange(b, o + gtHeader, b.length))
    SccpAddr(ssn, gt)
  }

  /** P9/R6: SCCP parse. UDT(9): pclass + 3 pointers + 3 len-prefixed
    * parts (called, calling, data). XUDT(17)/XUDTS(18): +hop counter, 4th
    * pointer to optional params; segmentation = option tag 16, len 4:
    * first-bit + remaining count + 3-byte reference (`gsm_map.py:183-242`). */
  def sccpParse(opc: Int, dpc: Int, b: Array[Byte]): Option[SccpMsg] = {
    if (b.length < 5) return None
    val t = b(0) & 0xff
    if (t != 9 && t != 17 && t != 18) return None
    val ptrBase = if (t == 9) 2 else 3 // UDT: pclass; XUDT: pclass + hop
    val nPtr = if (t == 9) 3 else 4
    if (b.length < ptrBase + nPtr) return None
    def part(i: Int): Array[Byte] = {
      val pOff = ptrBase + i
      val target = pOff + (b(pOff) & 0xff)
      if (target >= b.length) return Array.emptyByteArray
      val len = b(target) & 0xff
      if (target + 1 + len > b.length) return Array.emptyByteArray
      java.util.Arrays.copyOfRange(b, target + 1, target + 1 + len)
    }
    val data = part(2)
    var seg: Option[(Boolean, Int, Long)] = None
    if (t != 9 && (b(ptrBase + 3) & 0xff) != 0) {
      var o = ptrBase + 3 + (b(ptrBase + 3) & 0xff)
      var done = false
      while (!done && o + 2 <= b.length) {
        val tag = b(o) & 0xff
        if (tag == 0) done = true
        else {
          val len = b(o + 1) & 0xff
          if (o + 2 + len > b.length) done = true
          else {
            if (tag == 16 && len == 4) {
              val first = (b(o + 2) & 0x80) != 0
              val remaining = b(o + 2) & 0x0f
              val ref = beLong(b, o + 3, 3)
              seg = Some((first, remaining, ref))
            }
            o += 2 + len
          }
        }
      }
    }
    Some(SccpMsg(opc, dpc, t, data, seg, sccpAddr(part(0)), sccpAddr(part(1))))
  }

  /** R6: SCCP segmentation reassembly for one segmentation reference:
    * first segment stores, middle segments append, remaining==0
    * finalizes (`gsm_map.py:211-242`). Input must be in frame order. */
  def reassembleSegments(segs: Seq[SccpMsg]): Option[Array[Byte]] = {
    var buf: Array[Byte] = Array.emptyByteArray
    var complete = false
    for (s <- segs if !complete) {
      s.segmentation match {
        case Some((_, remaining, _)) =>
          buf = buf ++ s.data
          if (remaining == 0) complete = true
        case None => ()
      }
    }
    if (complete) Some(buf) else None
  }

  private val TcapTypes = Map(0x62 -> "begin", 0x64 -> "end", 0x65 -> "continue", 0x67 -> "abort")

  /** F26/F27 + targeted BER walk: message type, otid(0x48)/dtid(0x49),
    * component type (invoke 0xa1 / returnResultLast 0xa2 / returnError
    * 0xa3), opcode (first INTEGER in the component), error code, and
    * IMSI/MSISDN via the reference's BCD heuristics (F2: last 8 bytes of
    * the first octet-string; F3: last 6 bytes with trailing-f strip). */
  def tcapParse(b: Array[Byte]): Option[TcapMsg] = {
    val top = Ber.tlv(b, 0, b.length)
    if (top == null) return None
    val (tag, vOff, vLen, _) = top
    val messType = TcapTypes.getOrElse(tag, return None)
    val end = vOff + vLen
    def tidOf(t: Int): Long =
      Ber.findFirst(b, vOff, end, t).map { case (o, l) => beLong(b, o, math.min(l, 8)) }.getOrElse(-1L)
    val otid = tidOf(0x48)
    val dtid = tidOf(0x49)
    // F26: tid = otid for begin/continue, dtid for end/abort
    val tcapTid = if (messType == "begin" || messType == "continue") otid else dtid

    var component = -1
    var opCode = -1
    var errCode = -1
    var imsi = ""
    var msisdn = ""
    Ber.findFirst(b, vOff, end, 0x6c).foreach { case (cOff, cLen) =>
      val cEnd = cOff + cLen
      val comp = Ber.tlv(b, cOff, cEnd)
      if (comp != null) {
        val (cTag, cvOff, cvLen, _) = comp
        component = cTag match {
          case 0xa1 => 1 // invoke
          case 0xa2 => 2 // returnResultLast
          case 0xa3 => 3 // returnError
          case _ => -1
        }
        // opcode / error code: first INTEGER after the invoke-id INTEGER
        val ints = collectTags(b, cvOff, cvOff + cvLen, 0x02, max = 2)
        if (ints.nonEmpty && component >= 1) {
          val codeSlot = if (ints.length > 1) ints(1) else ints.head
          val v = beLong(b, codeSlot._1, math.min(codeSlot._2, 4)).toInt
          if (component == 3) errCode = v else opCode = v
        }
        // first OCTET STRING in the parameter → BCD subscriber ids
        Ber.findFirst(b, cvOff, cvOff + cvLen, 0x04).foreach { case (o, l) =>
          val bytes = java.util.Arrays.copyOfRange(b, o, o + l)
          if (l >= 5) { // F2: IMSI from the last 8 bytes
            val tail = bytes.takeRight(8)
            imsi = bcdSwapDecode(tail)
          }
          if (l >= 3 && l <= 8) { // F3: MSISDN candidate — TON/NPI + digits
            msisdn = bcdSwapDecode(bytes.drop(1))
          }
        }
      }
    }
    Some(TcapMsg(messType, otid, dtid, tcapTid, component, opCode, errCode, imsi, msisdn))
  }

  private def collectTags(b: Array[Byte], off: Int, end: Int, tag: Int, max: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var o = off
    var n = 0
    while (o < end && n < max) {
      val t = Ber.tlv(b, o, end)
      if (t == null) return out.result()
      val (tg, vOff, vLen, next) = t
      if (tg == tag) { out += ((vOff, vLen)); n += 1 }
      o = next
    }
    out.result()
  }
}
