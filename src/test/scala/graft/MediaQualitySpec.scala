package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.JvmImageCodec
import graft.operators.MediaQuality

/** Image quality gates: every rule fires on its planted case, verdicts
  * are total (undecodable rows get a verdict, not an omission), and the
  * stats pass is integer-exact. */
class MediaQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private def png(w: Int, h: Int, luma: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val v = luma(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    JvmImageCodec.encodePng(img)
  }

  test("each rule fires on its planted case; good images keep") {
    val media = Seq(
      (1L, png(16, 16, (x, y) => 30 + x * 8)), // good: spread 120
      (2L, png(4, 16, (x, y) => 30 + x * 8)), // small (w)
      (3L, png(16, 16, (_, _) => 128)), // uniform
      (4L, png(48, 8, (x, y) => 30 + (x + y) % 100)), // aspect 6:1
      (5L, Array[Byte](1, 2, 3)), // undecodable
      (6L, png(4, 4, (_, _) => 7))) // small AND uniform
      .toDF("img_id", "png")
    val got = MediaQuality.imageGates(media, "img_id", "png", 8, 8, 10, 4)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(4), r.getString(5))))
      .toMap
    assert(got(1L) === ((true, "")))
    assert(got(2L) === ((false, "small")))
    assert(got(3L) === ((false, "uniform")))
    assert(got(4L) === ((false, "aspect")))
    assert(got(5L) === ((false, "undecodable")))
    assert(got(6L) === ((false, "small,uniform")))
  }

  test("stats are integer-exact over the decoded pixels") {
    val media = Seq((9L, png(5, 3, (x, y) => 20 + x * 10 + y))).toDF("img_id", "png")
    val r = MediaQuality.imageStats(media, "img_id", "png").collect().head
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) === ((5, 3, 20, 62)))
  }

  test("audio gates: every rule fires; stats integer-exact through real WAV round-trip") {
    import graft.multimodal.Multimodal.JvmAudioCodec
    def wav(samples: Array[Short]) = JvmAudioCodec.encodeWavS16Mono(samples, 8000)
    val media = Seq(
      (1L, wav(Array.tabulate[Short](256)(t => (1000 + t * 10).toShort))), // good
      (2L, wav(Array.fill[Short](32)(1000))), // short
      (3L, wav(Array.tabulate[Short](256)(t => if (t % 4 == 0) 5000 else 10))), // 75% silent
      (4L, wav(Array.tabulate[Short](256)(t => if (t % 3 == 0) 32760 else 1000))), // 34% clipped
      (5L, Array[Byte](7, 7, 7))) // undecodable
      .toDF("clip_id", "wav")
    val got = graft.operators.MediaQuality.audioGates(media, "clip_id", "wav",
      minSamples = 64, silenceAbs = 328, maxSilencePct = 50,
      clipAbs = 32700, maxClipPct = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5))))
      .toMap
    assert(got(1L) === ((256L, 0L, 0L, true, "")))
    assert(got(2L) === ((32L, 0L, 0L, false, "short")))
    assert(got(3L) === ((256L, 75L, 0L, false, "silent")))
    assert(got(4L) === ((256L, 0L, 33L, false, "clipped")))
    assert(got(5L) === ((-1L, -1L, -1L, false, "undecodable")))
  }

  test("video gates: every rule fires; AVI and GIF containers agree") {
    import graft.multimodal.Multimodal.{JvmAviCodec, JvmGifCodec}
    def frames(nf: Int, w: Int, h: Int, luma: Int => Int) = (0 until nf).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = luma(f)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      img
    }
    val walk = (f: Int) => 100 + f * 3
    val media = Seq(
      (1L, JvmAviCodec.encodeMjpegAvi(frames(16, 8, 6, walk), 10)), // good
      (2L, JvmAviCodec.encodeMjpegAvi(frames(4, 8, 6, walk), 10)), // short
      (3L, JvmAviCodec.encodeMjpegAvi(frames(16, 8, 6, _ => 100), 10)), // static
      (4L, JvmAviCodec.encodeMjpegAvi(frames(16, 2, 2, walk), 10)), // small
      (5L, Array[Byte](4, 4, 4)), // undecodable
      (6L, JvmGifCodec.encodeAnimatedGif(frames(16, 8, 6, walk)))) // GIF route
      .toDF("clip_id", "avi")
    val got = graft.operators.MediaQuality.videoGates(media, "clip_id", "avi",
      minFrames = 8, minW = 4, minH = 4, minSpread = 5)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(5), r.getString(6)))).toMap
    assert(got(1L) === ((true, "")))
    assert(got(2L) === ((false, "short")))
    assert(got(3L) === ((false, "static")))
    assert(got(4L) === ((false, "small")))
    assert(got(5L) === ((false, "undecodable")))
    assert(got(6L) === ((true, ""))) // same frames via GIF: same verdict
  }

  test("null ids are filtered; null bytes verdict as undecodable") {
    val media = Seq(
      (Option(1L), Option(png(16, 16, (x, _) => 30 + x * 8))),
      (None: Option[Long], Option(png(16, 16, (x, _) => 30 + x * 8))),
      (Option(3L), None: Option[Array[Byte]]))
      .toDF("img_id", "png")
    val got = MediaQuality.imageGates(media, "img_id", "png", 8, 8, 10, 4)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got.keySet === Set(1L, 3L))
    assert(got(3L) === "undecodable")
  }
}
