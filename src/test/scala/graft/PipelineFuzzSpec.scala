package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl._
import graft.sources.Pcap

/** End-to-end totality for every capture pipeline: a directory mixing
  * valid captures with bit-flipped, truncated, length-stamped and pure
  * garbage files must flow through each `records(path)` pipeline —
  * decode → reassemble → parse → correlate glue included — without
  * throwing. [[DecoderTotalitySpec]] pins the per-function contracts;
  * this pins the Spark-side composition the 100 TB ingest actually
  * runs (one corrupt blob in a million-file corpus must cost its
  * frames, not the job).
  */
class PipelineFuzzSpec extends AnyFunSuite {

  private var s = org.scalacheck.rng.Seed(4242L)
  private def gen[A](g: Gen[A]): A = {
    val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v
  }
  private def mutate(valid: Array[Byte]): Array[Byte] = {
    val b = valid.clone()
    for (_ <- 0 until gen(Gen.chooseNum(1, 6))) {
      val i = gen(Gen.chooseNum(0, b.length - 1))
      b(i) = gen(Gen.chooseNum(-128, 127)).toByte
    }
    if (gen(Gen.prob(0.4))) java.util.Arrays.copyOfRange(b, 0, gen(Gen.chooseNum(0, b.length)))
    else b
  }

  private def sctpFrame(src: Array[Byte], dst: Array[Byte], seq: Int,
      payload: Array[Byte]): Array[Byte] =
    ether(ipv4(132, src, dst, sctpData(3868, 3868, 0, seq, 3L, payload)))

  private def diameterCapture: Array[Byte] = {
    val req = diameterMsg(request = true, cmd = 316, hbh = 0x1111L, e2e = 0x2222L,
      strAvp(263, "sess;fz"), strAvp(264, "mme.fz"))
    val (a, b) = req.splitAt(30)
    pcapFile(Seq(
      (1000L, 1, sctpFrame(Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2), 10, a)),
      (1000L, 2, sctpFrame(Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2), 10, b))))
  }

  private def ss7Capture: Array[Byte] = {
    val imsiTbcd = Array(0x21, 0x43, 0x65, 0x87, 0x09, 0x21, 0x43, 0xf5).map(_.toByte)
    val invoke = ber(0xa1, cat(ber(0x02, Array[Byte](1)), ber(0x02, Array[Byte](45)),
      ber(0x30, ber(0x04, imsiTbcd))))
    val begin = ber(0x62, cat(ber(0x48, Array[Byte](0x11, 0x22)), ber(0x6c, invoke)))
    val called = Array[Byte](0x12); val calling = Array[Byte](0x34)
    val sccp = cat(Array[Byte](9, 0),
      Array[Byte](3, (3 + called.length).toByte, (3 + called.length + calling.length).toByte),
      Array(called.length.toByte), called,
      Array(calling.length.toByte), calling,
      Array(begin.length.toByte), begin)
    val pd = cat(be32(101), be32(202), Array[Byte](3, 2, 0, 0), sccp)
    val param = cat(be16(0x0210), be16(4 + pd.length), pd)
    val m3ua = cat(Array[Byte](1, 0, 1, 1), be32(8L + param.length), param)
    pcapFile(Seq((100L, 0, ether(ipv4(132, Array[Byte](10, 0, 0, 1),
      Array[Byte](10, 0, 0, 2), sctpData(2905, 2905, 0, 0, 3L, m3ua))))))
  }

  private def httpCapture: Array[Byte] = {
    val text = "POST /r HTTP/1.1\r\nContent-Length: 5\r\nX-Id: 9\r\n\r\nhello"
    val frame = ether(ipv4(6, Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      tcp(40000, 80, 1L, 1L, 0x18, text.getBytes("ISO-8859-1"))))
    pcapFile(Seq((1000L, 1, frame)))
  }

  test("every pipeline survives a directory of corrupt captures") {
    val spark = SparkTest.spark
    val dir = Files.createTempDirectory("graftfuzz")
    val seeds = Seq(
      "diam" -> diameterCapture, "ss7" -> ss7Capture, "http" -> httpCapture,
      "ng" -> pcapngFile(1, Seq((1000L, ether(ipv4(6, Array[Byte](10, 0, 0, 1),
        Array[Byte](10, 0, 0, 2), tcp(1, 2, 1L, 1L, 0x18, Array[Byte](1, 2, 3))))))))
    for ((name, bytes) <- seeds) {
      Files.write(dir.resolve(s"$name.pcap"), bytes)
      for (i <- 0 until 8)
        Files.write(dir.resolve(s"${name}_m$i.pcap"), mutate(bytes))
      // adversarial per-record length stamp inside the record header
      val stamped = bytes.clone()
      if (stamped.length >= 40) {
        stamped(32) = 0xff.toByte; stamped(33) = 0xff.toByte
        stamped(34) = 0xff.toByte; stamped(35) = 0x7f.toByte
      }
      Files.write(dir.resolve(s"${name}_len.pcap"), stamped)
    }
    Files.write(dir.resolve("garbage.pcap"),
      Array.fill(gen(Gen.chooseNum(100, 500)))(gen(Gen.chooseNum(-128, 127)).toByte))
    Files.write(dir.resolve("empty.pcap"), Array.emptyByteArray)

    val glob = dir.toString + "/*.pcap"
    // each pipeline end-to-end; counts are irrelevant, throwing fails
    assert(Pcap.frames(spark, glob).count() >= 0)
    assert(DiameterPipeline.records(spark, glob).toDF().count() >= 0)
    assert(Http.records(spark, glob).count() >= 0)
    assert(HttpSs7.records(spark, glob).count() >= 0)
    assert(HttpOcs.records(spark, glob).count() >= 0)
    assert(Sip.records(spark, glob).count() >= 0)
    assert(SmppPipeline.records(spark, glob).count() >= 0)
    assert(GtpPipeline.records(spark, glob).count() >= 0)
    assert(GsmMapPipeline.records(spark, glob).count() >= 0)
    assert(Sigshark.tcapTransactions(spark, glob).toDF().count() >= 0)
    // the unmutated seeds must still yield their rows through the noise
    assert(DiameterPipeline.records(spark, glob).toDF().count() >= 1)
    assert(GsmMapPipeline.records(spark, glob).count() >= 1)
  }
}
