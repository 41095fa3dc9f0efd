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

  /** The one serialization core: header + records onto any stream, one
    * frame at a time — both the in-memory [[toBytes]] and the
    * bounded-memory [[streamFile]] go through it, so they are
    * byte-identical by construction. */
  private def writeFrames(out: java.io.OutputStream, dlt: Int,
      frames: Iterator[Frame], separators: Boolean): Unit = {
    out.write(le32(0xa1b2c3d4L)) // written LE → reads back as LE magic
    out.write(Array[Byte](2, 0, 4, 0))
    out.write(le32(0)); out.write(le32(0))
    out.write(le32(65535)); out.write(le32(dlt.toLong))
    var prev = -1L
    for (f <- frames) {
      if (separators && prev >= 0 && f.frameNo != prev + 1) {
        // O3: dummy separator record (16 zero bytes of header, no payload)
        out.write(new Array[Byte](16))
      }
      prev = f.frameNo
      out.write(le32(f.tsSec)); out.write(le32(f.tsUsec.toLong))
      out.write(le32(f.data.length.toLong)); out.write(le32(f.data.length.toLong))
      out.write(f.data)
    }
  }

  def toBytes(frames: Seq[Frame], dlt: Int, separators: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeFrames(bos, dlt, frames.iterator, separators)
    bos.toByteArray
  }

  /** Bounded-memory file write: frames arrive as an iterator (e.g. a
    * sorted Dataset's `toLocalIterator`, one partition resident at a
    * time) and go straight to a buffered stream — a capture larger
    * than driver memory writes without ever materializing. */
  def streamFile(path: java.nio.file.Path, dlt: Int, frames: Iterator[Frame],
      separators: Boolean = false): Unit = {
    val out = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(path))
    try writeFrames(out, dlt, frames, separators) finally out.close()
  }

  def writeFile(path: java.nio.file.Path, frames: Seq[Frame], dlt: Int): Unit =
    java.nio.file.Files.write(path, toBytes(frames, dlt))
}
