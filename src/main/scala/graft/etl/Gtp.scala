package graft.etl

import graft.functions.BinaryCodecs._

/** GTPv1/GTPv2 decode (SURVEY §2.8 F17, F19, F22, F29;
  * `gtp_ingestor.py:74-281`). Version from the top 3 bits of the flags
  * byte. IMSI/MSISDN are TBCD (F1). Where the reference hunts hex
  * patterns at magic offsets (F22), this decoder walks the information
  * elements properly — the documented deviation from SURVEY §7.3 #4, with
  * identical outputs on well-formed messages.
  */
final case class GtpMsg(
    gtpVersion: String,
    gtpMessage: String,
    gtpTeid: Long,
    gtpCause: String,
    gtpSeqNumber: Long,
    imsi: String,
    msisdn: String)

object Gtp {

  /** F17: GTPv1 message names (`gtp_ingestor.py:149-156,191-206`). */
  val V1MessageNames: Map[Int, String] = Map(
    1 -> "Echo Request", 2 -> "Echo Response",
    16 -> "Create PDP Context Request", 17 -> "Create PDP Context Response",
    18 -> "Update PDP Context Request", 19 -> "Update PDP Context Response",
    20 -> "Delete PDP Context Request", 21 -> "Delete PDP Context Response")

  /** F17: GTPv2 message names. */
  val V2MessageNames: Map[Int, String] = Map(
    1 -> "Echo Request", 2 -> "Echo Response",
    32 -> "Create Session Request", 33 -> "Create Session Response",
    34 -> "Modify Bearer Request", 35 -> "Modify Bearer Response",
    36 -> "Delete Session Request", 37 -> "Delete Session Response")

  /** F17: cause names (subset used by the reference). */
  val CauseNames: Map[Int, String] = Map(
    16 -> "Request accepted", 128 -> "Request accepted")

  def decode(b: Array[Byte]): Option[GtpMsg] = {
    if (b.length < 8) return None
    val version = (b(0) >> 5) & 0x7
    version match {
      case 1 => decodeV1(b)
      case 2 => decodeV2(b)
      case _ => None
    }
  }

  private def decodeV1(b: Array[Byte]): Option[GtpMsg] = {
    val msgType = b(1) & 0xff
    val teid = beLong(b, 4, 4)
    val hasOpt = (b(0) & 0x07) != 0 // E/S/PN flags → 4 extra header bytes
    var seq = 0L
    var off = 8
    if (hasOpt && b.length >= 12) {
      seq = beLong(b, 8, 2)
      off = 12
    }
    var imsi, msisdn, cause = ""
    // GTPv1 IEs: TV (fixed) or TLV (type >= 128)
    var guard = 0
    while (off < b.length && guard < 64) {
      guard += 1
      val t = b(off) & 0xff
      if (t < 128) {
        val len = t match {
          case 1 => 1 // Cause
          case 2 => 8 // IMSI
          case 14 => 1 // Recovery
          case 16 => 4 // TEI Data I
          case 17 => 4 // TEI Control Plane
          case _ => -1
        }
        if (len < 0 || off + 1 + len > b.length) return finish()
        t match {
          case 1 => cause = CauseNames.getOrElse(b(off + 1) & 0xff, (b(off + 1) & 0xff).toString)
          case 2 =>
            // F29 heuristic gate: decoded IMSI must exceed 10 digits
            // (`gtp_ingestor.py:249-251`), filtering false positives
            val cand = tbcdDecode(java.util.Arrays.copyOfRange(b, off + 1, off + 9))
            if (cand.length > 10) imsi = cand
          case _ => ()
        }
        off += 1 + len
      } else {
        if (off + 3 > b.length) return finish()
        val len = beInt(b, off + 1, 2)
        if (off + 3 + len > b.length) return finish()
        if (t == 0x86 && len >= 1) // MS International PSTN/ISDN Number
          msisdn = tbcdDecode(java.util.Arrays.copyOfRange(b, off + 4, off + 3 + len))
        off += 3 + len
      }
    }
    def finish(): Option[GtpMsg] = Some(GtpMsg("v1",
      V1MessageNames.getOrElse(msgType, msgType.toString), teid, cause, seq, imsi, msisdn))
    finish()
  }

  private def decodeV2(b: Array[Byte]): Option[GtpMsg] = {
    val hasTeid = (b(0) & 0x08) != 0
    val msgType = b(1) & 0xff
    var off = 4
    var teid = 0L
    if (hasTeid) {
      if (b.length < 12) return None
      teid = beLong(b, 4, 4)
      off = 8
    }
    val seq = beLong(b, off, 3)
    off += 4
    var imsi, msisdn, cause = ""
    var guard = 0
    while (off + 4 <= b.length && guard < 64) {
      guard += 1
      val t = b(off) & 0xff
      val len = beInt(b, off + 1, 2)
      if (off + 4 + len > b.length) return mk()
      t match {
        case 1 => imsi = tbcdDecode(java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len))
        case 2 if len >= 2 =>
          cause = CauseNames.getOrElse(b(off + 4) & 0xff, (b(off + 4) & 0xff).toString)
        case 76 => msisdn = tbcdDecode(java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len))
        case _ => ()
      }
      off += 4 + len
    }
    def mk(): Option[GtpMsg] = Some(GtpMsg("v2",
      V2MessageNames.getOrElse(msgType, msgType.toString), teid, cause, seq, imsi, msisdn))
    mk()
  }
}
