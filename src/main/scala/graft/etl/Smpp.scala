package graft.etl

import graft.functions.BinaryCodecs._

/** SMPP PDU framing + decode (SURVEY §2.3 R8, §2.8 F24;
  * `smpp_ingestor.py:109-158`). Header is 4 big-endian u32s: length,
  * command_id, command_status, sequence_number; body fields are
  * C-strings. Only the whitelisted commands are persisted (P16):
  * submit_sm / deliver_sm / data_sm and their `_resp` variants — request
  * branch fills source/destination_addr, response branch fills
  * command_status.
  */
final case class SmppPdu(
    commandId: Long,
    commandName: String,
    sequenceNumber: Long,
    commandStatus: Long,
    sourceAddr: String,
    destinationAddr: String)

object Smpp {

  final val RespBit = 0x80000000L

  val CommandNames: Map[Long, String] = Map(
    0x00000004L -> "submit_sm",
    0x00000005L -> "deliver_sm",
    0x00000103L -> "data_sm",
    0x80000004L -> "submit_sm_resp",
    0x80000005L -> "deliver_sm_resp",
    0x80000103L -> "data_sm_resp")

  /** R8: length-prefixed framing loop — multiple PDUs per TCP segment.
    * Stops cleanly at a truncated tail (remainder belongs to the next
    * segment; the reassembly layer owns that). */
  def framePdus(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off + 16 <= b.length) {
      val len = beLong(b, off, 4).toInt
      if (len < 16 || off + len > b.length) return out.result()
      out += java.util.Arrays.copyOfRange(b, off, off + len)
      off += len
    }
    out.result()
  }

  /** Bytes still missing for the first PDU in `b` to be complete; 0 when
    * complete or unframeable. */
  def missingBytes(b: Array[Byte]): Int =
    if (b.length < 16) 16 - b.length
    else {
      val len = beLong(b, 0, 4).toInt
      if (len > b.length) len - b.length else 0
    }

  private def cstring(b: Array[Byte], off: Int): (String, Int) = {
    var end = off
    while (end < b.length && b(end) != 0) end += 1
    (new String(b, off, end - off, "ISO-8859-1"), math.min(end + 1, b.length))
  }

  /** F24/P16: decode one framed PDU. Non-whitelisted commands → None. */
  def decodePdu(b: Array[Byte]): Option[SmppPdu] = {
    if (b.length < 16) return None
    val cmdId = beLong(b, 4, 4)
    val status = beLong(b, 8, 4)
    val seq = beLong(b, 12, 4)
    val name = CommandNames.getOrElse(cmdId, return None)
    if (seq < 0) return None
    if ((cmdId & RespBit) != 0) {
      Some(SmppPdu(cmdId, name, seq, status, "", ""))
    } else {
      // body: service_type cstr, src ton(1)+npi(1), source_addr cstr,
      //       dst ton(1)+npi(1), destination_addr cstr
      var off = 16
      val (_, o1) = cstring(b, off)
      off = o1 + 2
      val (src, o2) = cstring(b, math.min(off, b.length))
      off = o2 + 2
      val (dst, _) = cstring(b, math.min(off, b.length))
      Some(SmppPdu(cmdId, name, seq, status, src, dst))
    }
  }
}
