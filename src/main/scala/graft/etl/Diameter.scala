package graft.etl

import graft.functions.BinaryCodecs._

/** Diameter message decode (SURVEY §2.8 F5-F6, F21; `diameter.py:112-208`)
  * and the correlated output record (`models.py:7-27`).
  *
  * Header: version(1B)=1, length(24-bit), flags(1B, 0x80=request),
  * command-code(24-bit), application-id(4B), hop-by-hop(4B),
  * end-to-end(4B); then a TLV AVP walk with 4-byte padding and grouped-AVP
  * descent for Experimental-Result (297→298) and Subscription-Id
  * (443→450/444).
  */
final case class DiameterMsg(
    request: Boolean,
    commandCode: Int,
    applicationId: Long,
    hopByHopId: Long,
    endToEndId: Long,
    sessionId: String,
    originHost: String,
    originRealm: String,
    destinationHost: String,
    destinationRealm: String,
    resultCode: Option[Long],
    expResultCode: Option[Long],
    msisdn: String,
    imsi: String)

final case class DiameterRec(
    framesList: String,
    timeEpoch: Long,
    usecondsEpoch: Int,
    srcIp: String,
    dstIp: String,
    pcapFilename: String,
    request: Boolean,
    commandCode: Int,
    hopByHopId: Long,
    endToEndId: Long,
    sessionId: String,
    originHost: String,
    originRealm: String,
    destinationHost: String,
    destinationRealm: String,
    resultCode: Option[Long],
    expResultCode: Option[Long],
    msisdn: String,
    imsi: String)

object Diameter {

  final val Port = 3868
  final val CmdDeviceWatchdog = 280

  // AVP codes actually consumed (SURVEY F21)
  private final val AvpUserName = 1
  private final val AvpSessionId = 263
  private final val AvpOriginHost = 264
  private final val AvpResultCode = 268
  private final val AvpDestinationRealm = 283
  private final val AvpDestinationHost = 293
  private final val AvpOriginRealm = 296
  private final val AvpExperimentalResult = 297
  private final val AvpExperimentalResultCode = 298
  private final val AvpSubscriptionId = 443
  private final val AvpSubscriptionIdData = 444
  private final val AvpSubscriptionIdType = 450

  /** Expected total message length if `b` starts a Diameter message and the
    * header is readable; -1 otherwise. Used by reassembly to detect
    * incomplete buffers (`diameter.py:127-128`). */
  /** Declared total length of the Diameter message starting at b(0):
    *   - version byte ≠ 1 → -1 (garbage; the machine emits as-is and
    *     decode quarantines it — `diameter.py:114-116`);
    *   - version 1 but < 4 bytes buffered → 4 ("need more to read the
    *     length field"): the reassembler must STASH, exactly like a
    *     declared length exceeding the buffer. The reference never
    *     defines this case (its struct.unpack would throw on a short
    *     slice); conflating it with garbage emitted a 1-3 byte
    *     fragment AND desynced the rest of the flow whenever a TCP
    *     segment boundary fell inside the header (found by
    *     ReassemblePropSpec's random cuts). */
  def expectedLength(b: Array[Byte]): Int =
    if (b.isEmpty || b(0) != 1) -1
    else if (b.length < 4) 4
    else mask24(beLong(b, 0, 4)).toInt

  /** P7 + F21: decode one Diameter message. Returns None when version != 1
    * (`diameter.py:114-116`) or the buffer is shorter than the declared
    * length (incomplete — reassembly needed). */
  def decode(b: Array[Byte]): Option[DiameterMsg] = {
    if (b.length < 20 || b(0) != 1) return None
    val msgLen = mask24(beLong(b, 0, 4)).toInt
    if (msgLen > b.length) return None
    val flags = b(4) & 0xff
    val cmd = mask24(beLong(b, 4, 4)).toInt
    val appId = beLong(b, 8, 4)
    val hbh = beLong(b, 12, 4)
    val e2e = beLong(b, 16, 4)

    var sessionId, originHost, originRealm, destHost, destRealm = ""
    var msisdn, imsi = ""
    var resultCode, expResult: Option[Long] = None

    def str(off: Int, len: Int) = new String(b, off, len, "UTF-8")

    def walk(off0: Int, end: Int, depth: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val code = beLong(b, off, 4).toInt
        val vendorBit = (b(off + 4) & 0x80) != 0
        val avpLen = mask24(beLong(b, off + 4, 4)).toInt
        if (avpLen < 8 || off + avpLen > end) return
        val hdr = if (vendorBit) 12 else 8
        val vOff = off + hdr
        val vLen = avpLen - hdr
        code match {
          case AvpSessionId => sessionId = str(vOff, vLen)
          case AvpOriginHost => originHost = str(vOff, vLen)
          case AvpOriginRealm => originRealm = str(vOff, vLen)
          case AvpDestinationHost => destHost = str(vOff, vLen)
          case AvpDestinationRealm => destRealm = str(vOff, vLen)
          case AvpResultCode => if (vLen >= 4) resultCode = Some(beLong(b, vOff, 4))
          case AvpExperimentalResult if depth < 2 =>
            // grouped: scan members for 298
            var o = vOff
            while (o + 8 <= vOff + vLen) {
              val c2 = beLong(b, o, 4).toInt
              val l2 = mask24(beLong(b, o + 4, 4)).toInt
              if (l2 < 8 || o + l2 > vOff + vLen) { o = vOff + vLen }
              else {
                val h2 = if ((b(o + 4) & 0x80) != 0) 12 else 8
                if (c2 == AvpExperimentalResultCode && l2 - h2 >= 4)
                  expResult = Some(beLong(b, o + h2, 4))
                o += ((l2 + 3) / 4) * 4
              }
            }
          case AvpSubscriptionId if depth < 2 =>
            // grouped: 450 (type: 0=E164→msisdn, 1=IMSI) + 444 (data)
            var idType = -1L
            var idData = ""
            var o = vOff
            while (o + 8 <= vOff + vLen) {
              val c2 = beLong(b, o, 4).toInt
              val l2 = mask24(beLong(b, o + 4, 4)).toInt
              if (l2 < 8 || o + l2 > vOff + vLen) { o = vOff + vLen }
              else {
                val h2 = if ((b(o + 4) & 0x80) != 0) 12 else 8
                if (c2 == AvpSubscriptionIdType && l2 - h2 >= 4) idType = beLong(b, o + h2, 4)
                else if (c2 == AvpSubscriptionIdData) idData = str(o + h2, l2 - h2)
                o += ((l2 + 3) / 4) * 4
              }
            }
            if (idType == 0L && idData.nonEmpty) msisdn = idData
            else if (idType == 1L && idData.nonEmpty) imsi = idData
          case AvpUserName =>
            // F6: NAI "123456789012345@realm" → leading digits as IMSI
            val un = str(vOff, vLen)
            if (un.length > 16) {
              val m = "^([0-9]+)@".r.findFirstMatchIn(un)
              m.foreach(g => imsi = g.group(1))
            }
          case _ => ()
        }
        off += ((avpLen + 3) / 4) * 4
      }
    }
    walk(20, msgLen, 0)
    Some(DiameterMsg((flags & 0x80) != 0, cmd, appId, hbh, e2e, sessionId,
      originHost, originRealm, destHost, destRealm, resultCode, expResult, msisdn, imsi))
  }
}
