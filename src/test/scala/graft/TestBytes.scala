package graft

import java.io.ByteArrayOutputStream

/** Binary fixture builders (FIXTURES.md §A): hand-assembled pcap files,
  * Ethernet/IPv4/SCTP/TCP frames, and Diameter messages.
  */
object TestBytes {

  def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  def cat(parts: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    parts.foreach(bos.write)
    bos.toByteArray
  }

  /** Little-endian classic pcap file with DLT 1 (Ethernet). */
  def pcapFile(frames: Seq[(Long, Int, Array[Byte])]): Array[Byte] = {
    val hdr = cat(le32(0xa1b2c3d4L), Array[Byte](2, 0, 4, 0), le32(0), le32(0),
      le32(65535), le32(1))
    // NB: magic written little-endian → reads back as 0xd4c3b2a1 (LE file)
    cat(hdr +: frames.map { case (sec, usec, data) =>
      cat(le32(sec), le32(usec), le32(data.length), le32(data.length), data)
    }: _*)
  }

  /** Minimal pcapng: SHB + IDB(dlt) + one EPB per frame (µs resolution). */
  def pcapngFile(dlt: Int, frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
    def block(btype: Long, body: Array[Byte]): Array[Byte] = {
      val len = 12 + body.length
      cat(be32OrLe(btype), le32(len), body, le32(len))
    }
    def be32OrLe(v: Long): Array[Byte] = le32(v)
    val shb = block(0x0a0d0d0aL, cat(le32(0x1a2b3c4dL), Array[Byte](1, 0, 0, 0),
      Array.fill[Byte](8)(-1)))
    val idb = block(1L, cat(Array[Byte](dlt.toByte, 0), be16(0).map(_ => 0: Byte), le32(65535)))
    val epbs = frames.map { case (tsMicros, data) =>
      val pad = (4 - data.length % 4) % 4
      block(6L, cat(le32(0), le32(tsMicros >>> 32), le32(tsMicros & 0xffffffffL),
        le32(data.length), le32(data.length), data, Array.fill[Byte](pad)(0)))
    }
    cat((Seq(shb, idb) ++ epbs): _*)
  }

  def ipv4(proto: Int, srcIp: Array[Byte], dstIp: Array[Byte], payload: Array[Byte],
      ipId: Int = 0, moreFrags: Boolean = false): Array[Byte] = {
    val totalLen = 20 + payload.length
    cat(Array[Byte](0x45, 0), be16(totalLen), be16(ipId),
      Array[Byte]((if (moreFrags) 0x20 else 0).toByte, 0), Array[Byte](64, proto.toByte),
      be16(0), srcIp, dstIp, payload)
  }

  def ether(payload: Array[Byte], ethertype: Int = 0x0800): Array[Byte] =
    cat(Array.fill[Byte](12)(0), be16(ethertype), payload)

  def tcp(srcPort: Int, dstPort: Int, seq: Long, ack: Long, flags: Int,
      payload: Array[Byte]): Array[Byte] =
    cat(be16(srcPort), be16(dstPort), be32(seq), be32(ack),
      Array[Byte](0x50, flags.toByte), be16(8192), be16(0), be16(0), payload)

  def sctpData(srcPort: Int, dstPort: Int, streamId: Int, streamSeq: Int,
      ppid: Long, payload: Array[Byte]): Array[Byte] = {
    val chunkLen = 16 + payload.length
    val pad = (4 - chunkLen % 4) % 4
    cat(be16(srcPort), be16(dstPort), be32(0), be32(0),
      Array[Byte](0, 0), be16(chunkLen), be32(1), be16(streamId), be16(streamSeq),
      be32(ppid), payload, Array.fill[Byte](pad)(0))
  }

  // --- SS7 builders ---

  /** BER TLV with one-byte tag + short-form length. */
  def ber(tag: Int, value: Array[Byte]): Array[Byte] =
    cat(Array(tag.toByte, value.length.toByte), value)

  /** Q.713 party address: SSN present + GTI 4 (TT + NP/ES + NAI header),
    * digits as nibble-swapped BCD. */
  def sccpAddrGt(ssn: Int, digitsBcd: Array[Byte]): Array[Byte] =
    cat(Array[Byte](0x12, ssn.toByte, 0, 0x11, 0x04), digitsBcd)

  /** SCCP UDT: pclass + 3 pointers + len-prefixed called/calling/data. */
  def sccpUdt(called: Array[Byte], calling: Array[Byte], data: Array[Byte]): Array[Byte] =
    cat(Array[Byte](9, 0),
      Array[Byte](3, (3 + called.length).toByte, (3 + called.length + calling.length).toByte),
      Array(called.length.toByte), called,
      Array(calling.length.toByte), calling,
      Array(data.length.toByte), data)

  /** M3UA transfer-DATA (class 1 type 1) with one protocol-data param
    * (tag 0x0210, SI=3) wrapping the SCCP bytes. */
  def m3uaTransfer(opc: Long, dpc: Long, sccp: Array[Byte]): Array[Byte] = {
    val pd = cat(be32(opc), be32(dpc), Array[Byte](3, 2, 0, 0), sccp)
    val param = cat(be16(0x0210), be16(4 + pd.length), pd)
    cat(Array[Byte](1, 0, 1, 1), be32(8L + param.length), param)
  }

  /** MTP3 on the wire (DLT 141): SIO (SI=3 → SCCP) + little-endian
    * routing label (dpc low 14 bits, opc next 14) + SCCP bytes. */
  def mtp3(opc: Int, dpc: Int, sccp: Array[Byte]): Array[Byte] =
    cat(Array[Byte](3), le32((dpc.toLong | (opc.toLong << 14)) & 0xffffffffL), sccp)

  // --- Diameter builders ---

  def avp(code: Int, value: Array[Byte]): Array[Byte] = {
    val len = 8 + value.length
    val pad = (4 - len % 4) % 4
    cat(be32(code), cat(Array[Byte](0x40), be32(len).drop(1)), value, Array.fill[Byte](pad)(0))
  }

  def groupedAvp(code: Int, members: Array[Byte]*): Array[Byte] = avp(code, cat(members: _*))

  def diameterMsg(request: Boolean, cmd: Int, hbh: Long, e2e: Long,
      avps: Array[Byte]*): Array[Byte] = {
    val body = cat(avps: _*)
    val len = 20 + body.length
    cat(cat(Array[Byte](1), be32(len).drop(1)),
      cat(Array[Byte]((if (request) 0x80 else 0).toByte), be32(cmd).drop(1)),
      be32(0), be32(hbh), be32(e2e), body)
  }

  def strAvp(code: Int, s: String): Array[Byte] = avp(code, s.getBytes("UTF-8"))
  def u32Avp(code: Int, v: Long): Array[Byte] = avp(code, be32(v))
}
