package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaRecord, Multimodal}
import graft.sources.{Pcap, PcapWriter}

class MultimodalSpec extends AnyFunSuite {

  test("multimodal decode: schema, determinism, per-partition batch shape") {
    val spark = SparkTest.spark
    import spark.implicits._
    val blobs = (0L until 20L).map(i => MediaRecord(i, "image",
      Array.tabulate[Byte](64 + i.toInt)(j => (i + j).toByte))).toDS().repartition(4)
    val out = Multimodal.decode(blobs).collect().sortBy(_.mediaId)
    assert(out.length == 20)
    // deterministic stub: same bytes → same meta/features on re-run
    val out2 = Multimodal.decode(blobs).collect().sortBy(_.mediaId)
    assert(out.map(_.meta) sameElements out2.map(_.meta))
    assert(out.forall(_.features.length == 8))
    assert(out.forall(d => math.abs(d.features.sum - 1f) < 1e-3))
    // typed schema survives into the DataFrame world
    val df = Multimodal.decode(blobs).toDF()
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.schema("content").dataType.typeName == "binary")
  }

  test("stub codec: mime sniff, resize cap, frame sampling") {
    import Multimodal.StubCodec._
    assert(sniffMime(Array(0xff, 0xd8, 0, 0).map(_.toByte)) == "image/jpeg")
    assert(sniffMime("hello".getBytes) == "application/octet-stream")
    assert(resize(new Array[Byte](5000), 1000).length == 1000)
    assert(sampleFrames(new Array[Byte](10240), 2).size == 5)
  }

  test("m1 blob pipeline: generator + repartition-by-size + decode end-to-end") {
    val df = graft.queries.Extras.m1MediaPipeline.run(SparkTest.spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // closed-form expectations for the first documents
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getString(1) == "image/jpeg")
    assert(byId(1L).getString(1) == "image/png")
    assert(byId(2L).getString(1) == "application/octet-stream")
    // doc 3: len = 16384 + 3*16384 = 65536 → resize caps at 32768, 16 frames
    assert(byId(3L).getLong(2) == 65536L)
    assert(byId(3L).getInt(3) == 32768)
    assert(byId(3L).getInt(4) == 16)
  }

  test("JvmImageCodec: real PNG round trip is pixel-exact; garbage decodes to None") {
    import graft.multimodal.Multimodal.JvmImageCodec._
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, (x * 40 << 16) | (y * 90 << 8) | 7)
    val png = encodePng(img)
    assert(graft.multimodal.Multimodal.StubCodec.sniffMime(png) == "image/png")
    val back = decodeImage(png).get
    assert(back.getWidth == 3 && back.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert((back.getRGB(x, y) & 0xffffff) == ((x * 40 << 16) | (y * 90 << 8) | 7))
    assert(decodeImage("not an image".getBytes).isEmpty)
    assert(meta(png).contains(graft.multimodal.MediaMeta("image/png", 3, 2, 0L)))
  }

  test("JvmImageCodec: nearest-neighbor resize and luma histogram are integer-exact") {
    import graft.multimodal.Multimodal.JvmImageCodec._
    // 4x2 source: left half black, right half white
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    // down to 2x1: dst x=0 samples src (0,0)=black, x=1 samples (2,0)=white
    val half = resizeNearest(img, 2, 1)
    assert((half.getRGB(0, 0) & 0xffffff) == 0 && (half.getRGB(1, 0) & 0xffffff) == 0xffffff)
    // luma: black=0 → bucket 0; white=(299+587+114)*255/1000=254 → bucket 3
    assert(lumaHistogram(half, 4).toSeq == Seq(1L, 0L, 0L, 1L))
  }

  test("JvmImageCodec: JPEG decodes to the right shape (lossy — pixels not compared)") {
    import graft.multimodal.Multimodal.JvmImageCodec._
    val img = new java.awt.image.BufferedImage(5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, (x * 50 << 16) | (y * 60 << 8))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpeg = out.toByteArray
    assert(graft.multimodal.Multimodal.StubCodec.sniffMime(jpeg) == "image/jpeg")
    val back = decodeImage(jpeg).get
    assert(back.getWidth == 5 && back.getHeight == 4)
    assert(meta(jpeg).contains(graft.multimodal.MediaMeta("image/jpeg", 5, 4, 0L)))
  }

  test("JvmAudioCodec: WAV round trip is sample-exact; garbage decodes to None") {
    import graft.multimodal.Multimodal.JvmAudioCodec._
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = encodeWavS16Mono(samples, 8000)
    val (meta, pcm) = decode(wav).get
    assert(meta == AudioMeta(8000, 1, 16, 6L, 0L)) // 6 frames / 8000 Hz → 0 ms
    assert(pcm.length == 12)
    assert(s16Features(pcm) == (0L + 100 + 100 + 32767 + 32768 + 7, 32768L))
    // reconstruct each sample to prove byte-exact PCM round trip
    val back = pcm.grouped(2).map(p => ((p(0) & 0xff) | (p(1) << 8)).toShort).toSeq
    assert(back == samples.toSeq)
    assert(decode("not audio".getBytes).isEmpty)
  }

  test("JvmGifCodec: animated GIF frame enumeration + sampling; uniform frames exact") {
    import graft.multimodal.Multimodal.{JvmGifCodec, StubCodec}
    val vals = Seq(13, 77, 200, 255, 0)
    val frames = vals.map { v =>
      val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    val gif = JvmGifCodec.encodeAnimatedGif(frames)
    assert(StubCodec.sniffMime(gif) == "image/gif")
    val dec = JvmGifCodec.decodeFrames(gif).get
    assert(dec.length == 5 && dec.head.getWidth == 6 && dec.head.getHeight == 4)
    // uniform-value frames round-trip pixel-exact through the palette
    for ((img, v) <- dec.zip(vals); y <- 0 until 4; x <- 0 until 6)
      assert((img.getRGB(x, y) & 0xff) == v)
    assert(JvmGifCodec.sampleFrames(dec, 2).length == 3) // indices 0, 2, 4
    assert(JvmGifCodec.decodeFrames("not a gif".getBytes).isEmpty)
  }

  test("JvmAviCodec: MJPEG AVI round trip — container meta, frame decode, uniform-exact") {
    import graft.multimodal.Multimodal.JvmAviCodec
    def gray(w: Int, h: Int, v: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    val vals = Seq(0, 7, 128, 200, 255)
    val frames = vals.map(v => gray(9, 7, v)) // odd dims on purpose
    val avi = JvmAviCodec.encodeMjpegAvi(frames, fps = 25)
    // RIFF magic
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val (meta, dec) = JvmAviCodec.decodeMjpegAvi(avi).get
    assert(meta.width == 9 && meta.height == 7)
    assert(meta.nFrames == 5 && meta.usecPerFrame == 40000 && meta.durationMs == 200)
    assert(dec.length == 5)
    // uniform-gray JPEG round trip is pixel-exact (the measured regime)
    assert(dec.map(f => f.getRGB(3, 4) & 0xff) == vals)
    assert(dec.forall(f => f.getWidth == 9 && f.getHeight == 7))
  }

  test("JvmAviCodec: decoder totality — garbage, truncation, wrong magic all None") {
    import graft.multimodal.Multimodal.JvmAviCodec
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val good = JvmAviCodec.encodeMjpegAvi(Seq(img), fps = 10)
    assert(JvmAviCodec.decodeMjpegAvi(Array.empty[Byte]).isEmpty)
    assert(JvmAviCodec.decodeMjpegAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(JvmAviCodec.decodeMjpegAvi(java.util.Arrays.copyOfRange(good, 0, 40)).isEmpty)
    // every truncation point decodes to None or a valid prefix — never throws
    (0 until good.length by 7).foreach { cut =>
      JvmAviCodec.decodeMjpegAvi(java.util.Arrays.copyOfRange(good, 0, cut))
    }
    assert(JvmAviCodec.decodeMjpegAvi(good).nonEmpty)
  }

  test("K5 pcap writer round-trips through the reader") {
    val frames = Pcap.decodeFile("a.pcap", TestBytes.pcapFile(Seq(
      (100L, 5, TestBytes.ether(Array[Byte](1, 2))),
      (101L, 6, TestBytes.ether(Array[Byte](3))))))
    val rewritten = Pcap.decodeFile("b.pcap", PcapWriter.toBytes(frames, dlt = 1))
    assert(rewritten.map(f => (f.frameNo, f.tsSec, f.tsUsec)) ==
      frames.map(f => (f.frameNo, f.tsSec, f.tsUsec)))
    assert(rewritten.zip(frames).forall { case (a, b) => a.data.sameElements(b.data) })
  }
}
