package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.sources.Pcap

/** The chunked classic-pcap read path ([[Pcap.decodeChunk]] + the DSv2
  * `chunkBytes` option): for ANY chunk boundaries — including cuts
  * inside record headers and payloads — the union of the chunks'
  * frames must equal the whole-file decode exactly (same timestamps
  * and bytes, each record owned by exactly one chunk, file-offset
  * frameNo restoring capture order), and a corrupt middle must cost
  * only the damaged region, with later chunks resyncing to recover the
  * tail the sequential walk abandons. */
class ChunkedPcapSpec extends AnyFunSuite {

  private var s = org.scalacheck.rng.Seed(777L)
  private def gen[A](g: Gen[A]): A = {
    val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v
  }

  private def randFile(nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { i =>
      val n = gen(Gen.chooseNum(0, 120))
      (gen(Gen.chooseNum(0L, 2000000000L)), gen(Gen.chooseNum(0, 999999)),
        Array.fill(n)(gen(Gen.chooseNum(-128, 127)).toByte))
    }
    pcapFile(frames)
  }

  private def chunked(bytes: Array[Byte], bounds: Seq[Long]): Seq[graft.sources.Frame] = {
    val h = Pcap.classicHeader(bytes).get
    val len = bytes.length.toLong
    val edges = (24L +: bounds.filter(b => b > 24 && b < len).sorted.distinct) :+ len
    edges.zip(edges.tail).flatMap { case (a, b) =>
      val readEnd = math.min(b + Pcap.chunkOverhang(h), len)
      val buf = java.util.Arrays.copyOfRange(bytes, a.toInt, readEnd.toInt)
      Pcap.decodeChunk("f.pcap", buf, a, b, len, h)
    }
  }

  test("any chunk boundaries reproduce the whole-file decode exactly") {
    for (_ <- 0 until 60) {
      val bytes = randFile(gen(Gen.chooseNum(0, 25)))
      val whole = Pcap.decodeFile("f.pcap", bytes)
      val nCuts = gen(Gen.chooseNum(0, 10))
      val cuts = (0 until nCuts).map(_ => gen(Gen.chooseNum(25L, math.max(25L, bytes.length - 1L))))
      val parts = chunked(bytes, cuts)
      assert(parts.length === whole.length)
      parts.zip(whole).foreach { case (c, w) =>
        assert(c.tsSec === w.tsSec)
        assert(c.tsUsec === w.tsUsec)
        assert(java.util.Arrays.equals(c.data, w.data))
      }
      // offset frameNo is strictly increasing = capture order restored
      assert(parts.map(_.frameNo) === parts.map(_.frameNo).sorted)
      assert(parts.map(_.frameNo).distinct.length === parts.length)
    }
  }

  test("a corrupt middle costs only the damaged region in chunked mode") {
    val bytes = randFile(30)
    val whole = Pcap.decodeFile("f.pcap", bytes)
    assert(whole.length === 30)
    // wreck frame 10's record header length field (huge incl_len)
    val off10 = {
      var off = 24
      for (_ <- 0 until 10)
        off += 16 + graft.functions.BinaryCodecs.leLong(bytes, off + 8, 4).toInt
      off
    }
    val damaged = bytes.clone()
    damaged(off10 + 8) = 0xff.toByte; damaged(off10 + 9) = 0xff.toByte
    damaged(off10 + 10) = 0xff.toByte; damaged(off10 + 11) = 0x7f.toByte
    val seq = Pcap.decodeFile("f.pcap", damaged)
    assert(seq.length === 10) // sequential walk stops at the damage
    // chunk boundary after the damage resyncs and recovers the tail
    val parts = chunked(damaged, Seq(off10 + 20L))
    assert(parts.length > 10)
    assert(parts.takeRight(1).head.tsSec === whole.last.tsSec)
  }

  test("chunk decoder is total on mutated captures") {
    for (_ <- 0 until 200) {
      val bytes = randFile(gen(Gen.chooseNum(1, 8)))
      val b = bytes.clone()
      for (_ <- 0 until gen(Gen.chooseNum(1, 4))) {
        val i = gen(Gen.chooseNum(0, b.length - 1))
        b(i) = gen(Gen.chooseNum(-128, 127)).toByte
      }
      val mutated =
        if (gen(Gen.prob(0.5)))
          java.util.Arrays.copyOfRange(b, 0, gen(Gen.chooseNum(25, b.length)))
        else b
      Pcap.classicHeader(mutated).foreach { _ =>
        val cut = gen(Gen.chooseNum(25L, mutated.length.toLong))
        chunked(mutated, Seq(cut)).foreach(f => assert(f.data != null))
      }
    }
  }

  test("DSv2 chunkBytes option: ranged read matches the whole-file read") {
    val spark = SparkTest.spark
    import spark.implicits._
    // ~50 frames of ~4 KiB → ~200 KiB file → 4 chunks at 64 KiB
    val frames = (0 until 50).map { i =>
      (1000L + i, i % 1000000, Array.fill(4000)((i * 31).toByte))
    }
    val dir = Files.createTempDirectory("graftchunk")
    Files.write(dir.resolve("big.pcap"), pcapFile(frames))
    val plain = spark.read.format("pcap").load(dir.toString + "/*.pcap")
    val ranged = spark.read.format("pcap").option("chunkBytes", "65536")
      .load(dir.toString + "/*.pcap")
    assert(ranged.rdd.getNumPartitions > 1)
    val a = plain.selectExpr("tsSec", "tsUsec", "md5(data) AS h")
      .orderBy("tsSec").collect().toSeq
    val b = ranged.selectExpr("tsSec", "tsUsec", "md5(data) AS h")
      .orderBy("tsSec").collect().toSeq
    assert(a === b)
    // offset-numbered frames restore capture order by sorting on frameNo
    val nos = ranged.select("frameNo", "tsSec").orderBy("frameNo")
      .as[(Long, Long)].collect()
    assert(nos.map(_._2).toSeq === frames.map(_._1))
  }
}
