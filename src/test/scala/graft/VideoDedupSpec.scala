package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{JvmAviCodec, JvmGifCodec}
import graft.operators.VideoDedup

/** Video fingerprint: AVI + GIF container routes agree, totality. */
class VideoDedupSpec extends AnyFunSuite {

  private def frames(walkUp: Boolean): Seq[java.awt.image.BufferedImage] =
    (0 until 64).map { f =>
      val g = if (walkUp) 100 + f else 180 - f
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 6).foreach(y => (0 until 8).foreach(x =>
        img.setRGB(x, y, (g << 16) | (g << 8) | g)))
      img
    }

  test("the same frame sequence fingerprints identically via AVI and GIF containers") {
    val spark = SparkTest.spark
    import spark.implicits._
    val fs = frames(walkUp = true)
    val media = Seq(
      (1L, Option(JvmAviCodec.encodeMjpegAvi(fs, 10))),
      (2L, Option(JvmGifCodec.encodeAnimatedGif(fs))),
      (3L, Option(Array[Byte](1, 2, 3))), // neither container
      (4L, None: Option[Array[Byte]]))
      .toDF("clip_id", "clip")
    val sigs = VideoDedup.signatures(media, "clip_id", "clip")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.keySet === Set(1L, 2L))
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) === (1L << 63) - 1) // 63 rising comparisons, all set
    // and the direction matters
    val down = VideoDedup.signatures(
      Seq((9L, JvmAviCodec.encodeMjpegAvi(frames(walkUp = false), 10))).toDF("clip_id", "clip"),
      "clip_id", "clip").collect().head.getLong(1)
    assert(down === 0L)
  }

  test("clips shorter than 64 frames emit NO signature (no 0L sentinel family)") {
    val spark = SparkTest.spark
    import spark.implicits._
    assert(VideoDedup.fingerprint(frames(walkUp = true).take(10)) === None)
    // two different short clips: with the old 0L sentinel these were a
    // false Hamming-0 near-dup pair; now neither fingerprints
    val media = Seq(
      (1L, JvmAviCodec.encodeMjpegAvi(frames(walkUp = true).take(10), 10)),
      (2L, JvmAviCodec.encodeMjpegAvi(frames(walkUp = false).take(20), 10)),
      (3L, JvmAviCodec.encodeMjpegAvi(frames(walkUp = true), 10)))
      .toDF("clip_id", "clip")
    val sigs = VideoDedup.signatures(media, "clip_id", "clip")
    assert(sigs.collect().map(_.getLong(0)).toSeq === Seq(3L))
    assert(graft.operators.ImageDedup.nearPairs(sigs, 3).count() === 0L)
  }
}
