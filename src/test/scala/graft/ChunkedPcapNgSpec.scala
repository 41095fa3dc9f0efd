package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.sources.Pcap

/** The chunked pcapng read path ([[Pcap.ngPrologue]] +
  * [[Pcap.decodeNgChunk]] + the DSv2 `chunkBytes` option): for ANY
  * chunk boundaries — including cuts inside block headers, timestamps
  * and payloads — the union of the chunks' frames must equal the
  * whole-file decode exactly; section state comes from the plan-time
  * prologue, and a mid-file SHB/IDB (state later chunks could not see)
  * must fail LOUDLY instead of decoding with stale state. A corrupt
  * middle costs only the damaged region: later chunks resync past it —
  * the trailing-length redundancy of pcapng block framing makes the
  * boundary test stronger than the classic path's. */
class ChunkedPcapNgSpec extends AnyFunSuite {

  private var s = org.scalacheck.rng.Seed(4242L)
  private def gen[A](g: Gen[A]): A = {
    val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v
  }

  /** Epoch-µs tick counts with 16 decimal digits so the digit-slicing
    * timestamp semantics are exercised (10-digit seconds + 6-digit µs). */
  private def randFile(nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { _ =>
      val n = gen(Gen.chooseNum(0, 120))
      val ts = 1700000000000000L + gen(Gen.chooseNum(0L, 99999999999999L))
      (ts, Array.fill(n)(gen(Gen.chooseNum(-128, 127)).toByte))
    }
    pcapngFile(1, frames)
  }

  private def chunkedNg(bytes: Array[Byte], bounds: Seq[Long]): Seq[graft.sources.Frame] = {
    val pro = Pcap.ngPrologue(bytes, bytes.length.toLong).get
    val len = bytes.length.toLong
    val edges = (pro.dataStart +:
      bounds.filter(b => b > pro.dataStart && b < len).sorted.distinct) :+ len
    edges.zip(edges.tail).flatMap { case (a, b) =>
      val readEnd = math.min(b + Pcap.ngChunkOverhang, len)
      val buf = java.util.Arrays.copyOfRange(bytes, a.toInt, readEnd.toInt)
      Pcap.decodeNgChunk("f.pcapng", buf, a, b, len, pro)
    }
  }

  test("prologue parse: state + first-packet offset; incomplete head falls back") {
    val bytes = randFile(3)
    val pro = Pcap.ngPrologue(bytes, bytes.length.toLong).get
    assert(pro.le && pro.dlt === 1)
    assert(pro.dataStart === 28L + 20L) // SHB(28) + IDB(20) in the builder
    // a head window cut inside the prologue must refuse, not guess
    val cut = java.util.Arrays.copyOfRange(bytes, 0, 30)
    assert(Pcap.ngPrologue(cut, bytes.length.toLong).isEmpty)
    // not pcapng at all
    assert(Pcap.ngPrologue(pcapFile(Seq((1L, 0, Array[Byte](1)))), 100L).isEmpty)
  }

  test("any chunk boundaries reproduce the whole-file decode exactly") {
    for (_ <- 0 until 60) {
      val bytes = randFile(gen(Gen.chooseNum(0, 25)))
      val whole = Pcap.decodeFile("f.pcapng", bytes)
      val nCuts = gen(Gen.chooseNum(0, 10))
      val cuts = (0 until nCuts).map(_ =>
        gen(Gen.chooseNum(1L, math.max(1L, bytes.length - 1L))))
      val parts = chunkedNg(bytes, cuts)
      assert(parts.length === whole.length)
      parts.zip(whole).foreach { case (c, w) =>
        assert(c.tsSec === w.tsSec)
        assert(c.tsUsec === w.tsUsec)
        assert(c.dlt === w.dlt)
        assert(java.util.Arrays.equals(c.data, w.data))
      }
      // offset frameNo is strictly increasing = capture order restored
      assert(parts.map(_.frameNo) === parts.map(_.frameNo).sorted)
      assert(parts.map(_.frameNo).distinct.length === parts.length)
    }
  }

  test("a corrupt middle costs only the damaged region in chunked mode") {
    val bytes = randFile(30)
    val whole = Pcap.decodeFile("f.pcapng", bytes)
    assert(whole.length === 30)
    // find block 10's offset and wreck its total-length field
    val pro = Pcap.ngPrologue(bytes, bytes.length.toLong).get
    var off = pro.dataStart.toInt
    for (_ <- 0 until 10)
      off += graft.functions.BinaryCodecs.leLong(bytes, off + 4, 4).toInt
    val damaged = bytes.clone()
    damaged(off + 4) = 0xff.toByte; damaged(off + 5) = 0xff.toByte
    damaged(off + 6) = 0xff.toByte; damaged(off + 7) = 0x7f.toByte
    val seq = Pcap.decodeFile("f.pcapng", damaged)
    assert(seq.length === 10) // sequential walk stops at the damage
    // a chunk boundary after the damage resyncs and recovers the tail
    val parts = chunkedNg(damaged, Seq(off + 40L))
    assert(parts.length > 10)
    assert(parts.takeRight(1).head.tsSec === whole.last.tsSec)
  }

  test("mid-file IDB fails loudly instead of decoding with stale state") {
    val one = pcapngFile(1, Seq((1700000000000001L, Array[Byte](1, 2, 3, 4))))
    val two = pcapngFile(147, Seq((1700000000000002L, Array[Byte](5, 6, 7, 8))))
    // splice: SHB+IDB+EPB then the second file's IDB+EPB (skip its SHB)
    val spliced = cat(one, java.util.Arrays.copyOfRange(two, 28, two.length))
    // the whole-file stateful walk handles it (second frame gets dlt 147)
    val whole = Pcap.decodeFile("s.pcapng", spliced)
    assert(whole.map(_.dlt) === Seq(1, 147))
    val pro = Pcap.ngPrologue(spliced, spliced.length.toLong).get
    val e = intercept[java.io.IOException] {
      Pcap.decodeNgChunk("s.pcapng", spliced.drop(pro.dataStart.toInt),
        pro.dataStart, spliced.length.toLong, spliced.length.toLong, pro)
    }
    assert(e.getMessage.contains("IDB"))
  }

  test("over-cap block fails loudly, never truncates silently") {
    val big = Array.fill[Byte]((Pcap.NgMaxBlock + 4096).toInt)(3)
    val bytes = pcapngFile(1, Seq((1700000000000001L, Array[Byte](1)),
      (1700000000000002L, big)))
    val pro = Pcap.ngPrologue(bytes, bytes.length.toLong).get
    val len = bytes.length.toLong
    // a ranged task whose buffer (range + overhang) ends inside the
    // over-cap block must throw, not emit a truncated tail
    val buf = java.util.Arrays.copyOfRange(bytes, pro.dataStart.toInt,
      pro.dataStart.toInt + 200)
    val e = intercept[java.io.IOException] {
      Pcap.decodeNgChunk("b.pcapng", buf, pro.dataStart, len, len, pro)
    }
    assert(e.getMessage.contains("block cap"))
  }

  test("chunk decoders are total on mutated captures") {
    var ioFailures = 0
    for (_ <- 0 until 200) {
      val bytes = randFile(gen(Gen.chooseNum(1, 8)))
      val b = bytes.clone()
      for (_ <- 0 until gen(Gen.chooseNum(1, 4))) {
        val i = gen(Gen.chooseNum(0, b.length - 1))
        b(i) = gen(Gen.chooseNum(-128, 127)).toByte
      }
      val mutated =
        if (gen(Gen.prob(0.5)))
          java.util.Arrays.copyOfRange(b, 0, gen(Gen.chooseNum(1, b.length)))
        else b
      Pcap.ngPrologue(mutated, mutated.length.toLong).foreach { pro =>
        val cut = gen(Gen.chooseNum(pro.dataStart, mutated.length.toLong))
        try chunkedNg(mutated, Seq(cut)).foreach(f => assert(f.data != null))
        catch { case _: java.io.IOException => ioFailures += 1 } // loud guard paths are allowed
      }
    }
    assert(ioFailures < 50) // guards fire on a minority of mutations, not everything
  }

  test("a prologue past the plan-time head window falls back to the whole-file walk") {
    // SHB, then a 100 KiB unknown block (> the 64 KiB head window) before
    // the IDB: the planner must refuse to chunk (ngPrologue = None) and
    // keep the stateful single-task path — correct frames, dense frameNo
    val base = pcapngFile(1, Seq((1700000000000001L, Array[Byte](1, 2, 3)),
      (1700000000000002L, Array[Byte](4, 5, 6))))
    val bigLen = (100 << 10) + 16
    val bigBlock = cat(le32(10L), le32(bigLen.toLong),
      Array.fill[Byte](bigLen - 12)(0x11), le32(bigLen.toLong))
    val bytes = cat(java.util.Arrays.copyOfRange(base, 0, 28), bigBlock,
      java.util.Arrays.copyOfRange(base, 28, base.length))
    assert(Pcap.ngPrologue(java.util.Arrays.copyOfRange(bytes, 0,
      math.min(1 << 16, bytes.length)), bytes.length.toLong).isEmpty)
    val dir = Files.createTempDirectory("graftngfall")
    Files.write(dir.resolve("longprologue.pcapng"), bytes)
    val df = SparkTest.spark.read.format("pcap").option("chunkBytes", "65536")
      .load(dir.toString + "/*.pcapng")
    assert(df.rdd.getNumPartitions === 1)
    val rows = df.selectExpr("frameNo", "tsSec", "dlt").orderBy("frameNo").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // dense whole-file numbering
    assert(rows.map(_.getInt(2)).toSeq === Seq(1, 1))
  }

  test("DSv2 chunkBytes option: ranged pcapng read matches the whole-file read") {
    val spark = SparkTest.spark
    import spark.implicits._
    // ~50 frames of ~4 KiB → ~200 KiB file → 4 chunks at 64 KiB
    val frames = (0 until 50).map { i =>
      (1700000000000000L + i * 1000000L, Array.fill(4000)((i * 31).toByte))
    }
    val dir = Files.createTempDirectory("graftngchunk")
    Files.write(dir.resolve("big.pcapng"), pcapngFile(1, frames))
    val plain = spark.read.format("pcap").load(dir.toString + "/*.pcapng")
    val ranged = spark.read.format("pcap").option("chunkBytes", "65536")
      .load(dir.toString + "/*.pcapng")
    assert(ranged.rdd.getNumPartitions > 1)
    val a = plain.selectExpr("tsSec", "tsUsec", "dlt", "md5(data) AS h")
      .orderBy("tsSec").collect().toSeq
    val b = ranged.selectExpr("tsSec", "tsUsec", "dlt", "md5(data) AS h")
      .orderBy("tsSec").collect().toSeq
    assert(a === b)
    // offset-numbered frames restore capture order by sorting on frameNo
    val nos = ranged.select("frameNo", "tsSec").orderBy("frameNo")
      .as[(Long, Long)].collect()
    assert(nos.map(_._2).toSeq === frames.map(_._1 / 1000000L))
  }
}
