package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** Ranged WARC read: exactness under arbitrary chunk cuts, both
  * layouts, corrupt-middle recovery — the chunked-pcap discipline. */
class ChunkedWarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def rec(i: Int): Array[Byte] = {
    // variable-size, poorly-compressible bodies so chunk boundaries cut
    // records unevenly and the gz layout still spans several chunks
    val md = java.security.MessageDigest.getInstance("MD5")
    val noise = (0 until 1 + i % 13).map(j =>
      md.digest(s"w$i-$j".getBytes("UTF-8")).map("%02x".format(_)).mkString).mkString
    val body = s"payload $i $noise"
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://c/$i\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n").getBytes("UTF-8")
  }

  private val N = 1500
  private lazy val plainBytes: Array[Byte] = (0 until N).map(rec).reduce(_ ++ _)
  private lazy val gzBytes: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until N).foreach { i =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(rec(i)); g.finish()
    }
    out.toByteArray
  }

  private def write(name: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Files.createTempDirectory("cwarc").resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  private def uris(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("targetUri").collect().map(_.getString(0)).sorted.toSeq

  test("plain chunked read equals the whole-file read under uneven cuts") {
    val path = write("a.warc", plainBytes)
    val whole = uris(Warc.records(spark, path))
    val chunked = Warc.recordsChunked(spark, path, 1L << 16)
    assert(chunked.rdd.getNumPartitions >= 3, "chunking did not engage")
    assert(uris(chunked) === whole)
    assert(whole.size === N)
    // offsets are unique and ascending in file order
    val offs = chunked.select("recNo").collect().map(_.getLong(0)).sorted
    assert(offs.distinct.length === N)
  }

  test("gz chunked read equals the whole-file read, members verified by CRC") {
    val path = write("b.warc.gz", gzBytes)
    val whole = uris(Warc.records(spark, path))
    val chunked = Warc.recordsChunked(spark, path, 1L << 16)
    assert(chunked.rdd.getNumPartitions >= 3)
    assert(uris(chunked) === whole)
    assert(whole.size === N)
  }

  test("corrupt middle member loses only itself; resync recovers the rest") {
    val bytes = gzBytes.clone()
    // find the byte span of member ~N/2 by walking members
    var off = 0
    var k = 0
    while (k < N / 2) {
      val (_, clen) = Warc.gzipMember(bytes, off).get
      off += clen; k += 1
    }
    val (_, midLen) = Warc.gzipMember(bytes, off).get
    // wreck the member's interior (past the header) so CRC fails
    (off + 12 until math.min(off + midLen - 9, off + 64)).foreach(i => bytes(i) = 0x55)
    val path = write("c.warc.gz", bytes)
    val got = uris(Warc.recordsChunked(spark, path, 1L << 16))
    assert(got.size >= N - 2 && got.size < N, s"expected ~1 lost record, got ${got.size}")
  }

  test("chunk parser is total on random and mutated bytes (both layouts)") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 30) {
      val len = 1 + rnd.nextInt(8192)
      val junk = Array.fill[Byte](len)(rnd.nextInt().toByte)
      for (gz <- Seq(true, false)) {
        val got = Warc.chunkRecords(junk, if (round % 2 == 0) 0L else 4096L,
          math.min(len, 4096), gz, "fuzz")
        got.foreach(r => assert(r.contentLength >= 0)) // just drain safely
      }
    }
    // mutated real capture: flip bytes across the plain layout
    val bytes = plainBytes.clone()
    (0 until 200).foreach(_ => bytes(rnd.nextInt(bytes.length)) = rnd.nextInt().toByte)
    Warc.chunkRecords(bytes, 0L, bytes.length.toLong, gz = false, "mut").size
  }

  test("a record spanning a chunk boundary is owned by exactly one task") {
    val path = write("d.warc", plainBytes)
    // many different cut positions → every boundary lands mid-record
    // somewhere; ownership must never duplicate or drop
    for (shift <- Seq(0, 101, 997)) {
      val chunk = (1L << 16) + shift
      assert(uris(Warc.recordsChunked(spark, path, chunk)).size === N,
        s"chunk=$chunk broke ownership")
    }
  }
}
