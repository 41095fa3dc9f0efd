package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{JvmAviCodec, JvmGifCodec, JvmY4mCodec}

/** YUV4MPEG2 codec ([[JvmY4mCodec]]): gray round-trip exactness, meta
  * arithmetic, luma-only decode of subsampled colourspaces, decoder
  * totality, and container-invariance of the downstream video
  * fingerprint (the same frames through GIF and Y4M must hash
  * identically — the dispatch treats containers uniformly).
  */
class Y4mCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, v: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
      y += 1
    }
    img
  }

  private def gradient(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (seed * 31 + x * 13 + y * 7) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1
      }
      y += 1
    }
    img
  }

  test("gray frames round-trip pixel-exactly, odd dims and extreme values included") {
    val frames = Seq(gray(7, 5, 0), gray(7, 5, 255), gray(7, 5, 128),
      gradient(7, 5, 3))
    val y4m = JvmY4mCodec.encodeY4mMono(frames, fpsNum = 10, fpsDen = 1)
    val (meta, dec) = JvmY4mCodec.decodeY4m(y4m).get
    assert(meta == graft.multimodal.Multimodal.Y4mMeta(7, 5, 4, 10, 1, 400L))
    assert(dec.length == 4)
    for ((f, g) <- frames.zip(dec); y <- 0 until 5; x <- 0 until 7)
      assert((g.getRGB(x, y) & 0xff) == (f.getRGB(x, y) & 0xff),
        s"pixel ($x,$y) drifted")
  }

  test("C420jpeg decode is luma-only: chroma planes sized and skipped; default C tag honored") {
    val w = 6; val h = 4
    val yPlane = Array.tabulate(w * h)(i => ((i * 37) % 256).toByte)
    val chroma = Array.fill((w / 2) * (h / 2) * 2)(99.toByte)
    def stream(header: String): Array[Byte] =
      (header + "\n").getBytes("US-ASCII") ++
        "FRAME\n".getBytes("US-ASCII") ++ yPlane ++ chroma
    for (hdr <- Seq(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg",
        s"YUV4MPEG2 W$w H$h F25:1")) { // no C tag → the spec default
      val (meta, dec) = JvmY4mCodec.decodeY4m(stream(hdr)).get
      assert(meta.nFrames == 1L && meta.fpsNum == 25)
      assert(meta.durationMs == 40L)
      for (y <- 0 until h; x <- 0 until w)
        assert((dec.head.getRGB(x, y) & 0xff) == (yPlane(y * w + x) & 0xff))
    }
  }

  test("FRAME parameter lines accepted; totality on malformed input") {
    val ok = ("YUV4MPEG2 W2 H2 F10:1 Cmono\n" + "FRAME Ip\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    assert(JvmY4mCodec.decodeY4m(ok).get._2.length == 1)

    val good = JvmY4mCodec.encodeY4mMono(Seq(gray(4, 3, 77)), 10, 1)
    assert(JvmY4mCodec.decodeY4m(good.dropRight(1)).isEmpty, "truncated planes")
    assert(JvmY4mCodec.decodeY4m("JUNKMAGIC W2 H2\nFRAME\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0)).isEmpty, "bad magic")
    assert(JvmY4mCodec.decodeY4m(("YUV4MPEG2 W2 H2 F10:1 Cmono\n" +
      "FRAMEX\n").getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0)).isEmpty,
      "bad frame marker")
    assert(JvmY4mCodec.decodeY4m(("YUV4MPEG2 W2 H2 F10:1 C999weird\n" +
      "FRAME\n").getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0)).isEmpty,
      "unsupported colourspace")
    assert(JvmY4mCodec.decodeY4m(Array.fill(64)(0x41.toByte)).isEmpty, "garbage")
    assert(JvmY4mCodec.decodeY4m(("YUV4MPEG2 W2 H2 F10:1 Cmono\n")
      .getBytes("US-ASCII")).isEmpty, "zero frames")
  }

  test("container invariance: GIF and Y4M of the same frames fingerprint identically") {
    // 64+ frames so VideoDedup.fingerprint produces a signature
    val frames = (0 until 64).map(i => gray(8, 6, (i * 53 + 11) % 256))
    val viaY4m = JvmY4mCodec.decodeY4m(
      JvmY4mCodec.encodeY4mMono(frames, 10, 1)).get._2
    val viaGif = JvmGifCodec.decodeFrames(
      JvmGifCodec.encodeAnimatedGif(frames)).get
    val viaAvi = JvmAviCodec.decodeMjpegAvi(
      JvmAviCodec.encodeMjpegAvi(frames, fps = 10)).get._2
    val fY = graft.operators.VideoDedup.fingerprint(viaY4m)
    val fG = graft.operators.VideoDedup.fingerprint(viaGif)
    val fA = graft.operators.VideoDedup.fingerprint(viaAvi)
    assert(fY.isDefined && fY == fG,
      "GIF and Y4M containers must yield the same video signature")
    // uniform-gray JPEG round-trips exactly too, so MJPEG-AVI agrees
    assert(fY == fA, "MJPEG-AVI must agree on uniform-gray frames")
  }

  test("video near-dup kernel accepts y4m blobs through the dispatch") {
    val spark = SparkTest.spark
    import spark.implicits._
    val mk = (seed: Int) => JvmY4mCodec.encodeY4mMono(
      (0 until 64).map(i => gray(8, 6, (i * seed + 7) % 256)), 10, 1)
    val media = Seq((1L, mk(53)), (2L, mk(53)), (3L, mk(91)))
      .toDF("img_id", "bytes")
    val sigs = graft.operators.VideoDedup.signatures(media, "img_id", "bytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L))
    assert(sigs(1L) == sigs(2L), "identical y4m streams must hash equal")
  }
}
