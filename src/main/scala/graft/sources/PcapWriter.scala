package graft.sources

import java.io.ByteArrayOutputStream

/** K5 pcap writer (`sigshark.py:352-366`): global header + raw frames.
  * Used for tool-parity outputs (transaction-sorted captures, O1-O3).
  * Writes little-endian classic pcap; `separators` injects the
  * reference's 16-zero-byte dummy records between transaction groups
  * (O3, `sigshark.py:588-589`).
  */
object PcapWriter {

  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  def toBytes(frames: Seq[Frame], dlt: Int, separators: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(le32(0xa1b2c3d4L)) // written LE → reads back as LE magic
    bos.write(Array[Byte](2, 0, 4, 0))
    bos.write(le32(0)); bos.write(le32(0))
    bos.write(le32(65535)); bos.write(le32(dlt.toLong))
    var prev = -1L
    for (f <- frames) {
      if (separators && prev >= 0 && f.frameNo != prev + 1) {
        // O3: dummy separator record (16 zero bytes of header, no payload)
        bos.write(new Array[Byte](16))
      }
      prev = f.frameNo
      bos.write(le32(f.tsSec)); bos.write(le32(f.tsUsec.toLong))
      bos.write(le32(f.data.length.toLong)); bos.write(le32(f.data.length.toLong))
      bos.write(f.data)
    }
    bos.toByteArray
  }

  def writeFile(path: java.nio.file.Path, frames: Seq[Frame], dlt: Int): Unit =
    java.nio.file.Files.write(path, toBytes(frames, dlt))
}
