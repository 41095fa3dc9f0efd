package graft.etl

import graft.functions.BinaryCodecs._
import graft.sources.Frame

/** L3/L4 decode layer (SURVEY §2.2 P1-P9): one frame → one [[Packet]] with
  * transport payload attached. Pure byte logic, invoked from typed
  * `map`/`flatMap` over the frame source — short-circuits cheapest-first
  * exactly like the reference's manual predicate ordering
  * (`diameter.py:214-255`), since Catalyst cannot reorder inside the
  * decoder.
  */
final case class Packet(
    pcapFilename: String,
    frameNo: Long,
    tsSec: Long,
    tsUsec: Int,
    srcIp: String,
    dstIp: String,
    ipId: Int,
    ipMoreFragments: Boolean,
    ipProto: Int,
    srcPort: Int,
    dstPort: Int,
    tcpSeq: Long,
    tcpAck: Long,
    tcpFlags: Int,
    payload: Array[Byte])

/** One SCTP DATA chunk, exploded (R7 flatten: `sigshark.py:141-204`). */
final case class SctpChunk(
    pcapFilename: String,
    frameNo: Long,
    tsSec: Long,
    tsUsec: Int,
    srcIp: String,
    dstIp: String,
    srcPort: Int,
    dstPort: Int,
    chunkType: Int,
    streamId: Int,
    streamSeq: Int,
    ppid: Long,
    payload: Array[Byte])

object Packets {

  final val ProtoTcp = 6
  final val ProtoUdp = 17
  final val ProtoSctp = 132
  final val ProtoIpInIp = 4

  /** P2/P3: IPv4 + transport header decode. Returns None for non-IPv4
    * frames or unsupported transports. Walks ip-in-ip (F23). */
  def decode(f: Frame): Option[Packet] = {
    var off = graft.sources.Pcap.ipv4Offset(f.dlt, f.data)
    if (off < 0) return None
    val b = f.data
    // F23: unwrap nested IPv4 (protocol 4)
    var guard = 0
    while (guard < 4) {
      if (off + 20 > b.length || (b(off) >> 4 & 0xf) != 4) return None
      val ihl = (b(off) & 0xf) * 4
      val proto = b(off + 9) & 0xff
      if (proto == ProtoIpInIp) { off += ihl; guard += 1 }
      else guard = 4
    }
    // The loop can exit via the guard counter with `off` advanced past a 4th
    // nested header — re-validate before the final header reads, so a
    // truncated/crafted frame quarantines (None) instead of throwing inside
    // the flatMap and failing the job (reference `not_processed` semantics).
    if (off + 20 > b.length || (b(off) >> 4 & 0xf) != 4) return None
    val ihl = (b(off) & 0xf) * 4
    val proto = b(off + 9) & 0xff
    val ipId = beInt(b, off + 4, 2)
    val moreFrags = (b(off + 6) & 0x20) != 0
    val srcIp = ipv4String(b, off + 12)
    val dstIp = ipv4String(b, off + 16)
    val l4 = off + ihl
    proto match {
      case ProtoTcp =>
        if (l4 + 20 > b.length) return None
        val dataOff = ((b(l4 + 12) >> 4) & 0xf) * 4
        Some(Packet(f.pcapFilename, f.frameNo, f.tsSec, f.tsUsec, srcIp, dstIp, ipId, moreFrags,
          proto, beInt(b, l4, 2), beInt(b, l4 + 2, 2),
          beLong(b, l4 + 4, 4), beLong(b, l4 + 8, 4), b(l4 + 13) & 0xff,
          java.util.Arrays.copyOfRange(b, math.min(l4 + dataOff, b.length), b.length)))
      case ProtoUdp =>
        if (l4 + 8 > b.length) return None
        Some(Packet(f.pcapFilename, f.frameNo, f.tsSec, f.tsUsec, srcIp, dstIp, ipId, moreFrags,
          proto, beInt(b, l4, 2), beInt(b, l4 + 2, 2), 0L, 0L, 0,
          java.util.Arrays.copyOfRange(b, math.min(l4 + 8, b.length), b.length)))
      case ProtoSctp =>
        if (l4 + 12 > b.length) return None
        Some(Packet(f.pcapFilename, f.frameNo, f.tsSec, f.tsUsec, srcIp, dstIp, ipId, moreFrags,
          proto, beInt(b, l4, 2), beInt(b, l4 + 2, 2), 0L, 0L, 0,
          java.util.Arrays.copyOfRange(b, math.min(l4 + 12, b.length), b.length)))
      case _ => None
    }
  }

  /** R7/P8: explode an SCTP packet's chunk list into one record per chunk
    * (`sigshark.py:141-204`; chunk-type filters `diameter.py:258-269`).
    * `pkt.payload` must start at the first chunk (after the 12-byte SCTP
    * common header, as produced by [[decode]]). */
  def sctpChunks(pkt: Packet): Seq[SctpChunk] = {
    if (pkt.ipProto != ProtoSctp) return Seq.empty
    val b = pkt.payload
    val out = Seq.newBuilder[SctpChunk]
    var off = 0
    while (off + 4 <= b.length) {
      val ctype = b(off) & 0xff
      val clen = beInt(b, off + 2, 2)
      if (clen < 4 || off + clen > b.length) return out.result()
      if (ctype == 0 && clen >= 16) { // DATA
        out += SctpChunk(pkt.pcapFilename, pkt.frameNo, pkt.tsSec, pkt.tsUsec,
          pkt.srcIp, pkt.dstIp, pkt.srcPort, pkt.dstPort, ctype,
          beInt(b, off + 8, 2), beInt(b, off + 10, 2), beLong(b, off + 12, 4),
          java.util.Arrays.copyOfRange(b, off + 16, off + clen))
      } else {
        out += SctpChunk(pkt.pcapFilename, pkt.frameNo, pkt.tsSec, pkt.tsUsec,
          pkt.srcIp, pkt.dstIp, pkt.srcPort, pkt.dstPort, ctype, -1, -1, -1L, Array.emptyByteArray)
      }
      off += ((clen + 3) / 4) * 4
    }
    out.result()
  }
}
