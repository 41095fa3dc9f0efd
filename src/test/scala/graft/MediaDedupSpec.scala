package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{JvmAudioCodec, JvmAviCodec, JvmImageCodec}
import graft.operators.{Dedup, MediaDedup}

/** Composed media dedup: exact lane semantics, perceptual lane over
  * keepers only, verdict totality for undecodable bytes, and the skew
  * cap threading through to the pigeonhole kernel. */
class MediaDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private def png(shade: Int, up: Boolean = true): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 9).foreach(x => {
      val v = if (up) shade + x * 11 + y * 7 else shade - x * 11 - y * 7
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }))
    JvmImageCodec.encodePng(img)
  }

  test("exact lane collapses byte-identical copies; perceptual lane judges keepers only") {
    // {1,2,5} identical bytes; {3} same gradient different shade (same
    // dHash, different bytes); {4} reversed gradient (far)
    val media = Seq((1L, png(40)), (2L, png(40)), (3L, png(50)),
      (4L, png(200, up = false)), (5L, png(40))).toDF("img_id", "png")
    val got = MediaDedup.imageDedup(media, "img_id", "png", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(got === Seq((1L, "keep", -1L), (2L, "exact_dup", 1L),
      (3L, "near_dup", 1L), (4L, "keep", -1L), (5L, "exact_dup", 1L)))
  }

  test("undecodable bytes never pair perceptually but still dedup exactly") {
    val junk = Array[Byte](9, 9, 9, 9)
    val media = Seq((1L, junk), (2L, junk), (3L, Array[Byte](8, 8)), (4L, png(40)))
      .toDF("img_id", "png")
    val got = MediaDedup.imageDedup(media, "img_id", "png", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // identical junk: exact family; distinct junk: keep (no signature,
    // no invented pairs); the one real image keeps
    assert(got === Seq((1L, "keep"), (2L, "exact_dup"), (3L, "keep"), (4L, "keep")))
  }

  test("audio and video flavors compose the same lanes") {
    val wav = (up: Boolean) => {
      val s0 = Array.tabulate[Short](256)(t => (5000 + (if (up) t else -t) * 10).toShort)
      JvmAudioCodec.encodeWavS16Mono(s0, 8000)
    }
    val clips = Seq((1L, wav(true)), (2L, wav(true)), (3L, wav(false)))
      .toDF("clip_id", "wav")
    val aud = MediaDedup.audioDedup(clips, "clip_id", "wav", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(aud === Seq((1L, "keep"), (2L, "exact_dup"), (3L, "keep")))

    val avi = (up: Boolean) => {
      val frames = (0 until 64).map { f =>
        val img = new java.awt.image.BufferedImage(8, 6,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val v = if (up) 100 + f else 180 - f
        (0 until 6).foreach(y => (0 until 8).foreach(x =>
          img.setRGB(x, y, (v << 16) | (v << 8) | v)))
        img
      }
      JvmAviCodec.encodeMjpegAvi(frames, 10)
    }
    val vids = Seq((1L, avi(true)), (2L, avi(true)), (3L, avi(false)))
      .toDF("clip_id", "avi")
    val vid = MediaDedup.videoDedup(vids, "clip_id", "avi", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(vid === Seq((1L, "keep"), (2L, "exact_dup"), (3L, "keep")))
  }

  test("maxBucket threads through to the keeper pigeonhole kernel") {
    // 50 DISTINCT contents sharing one dHash (same gradient, different
    // shade): all 50 are exact keepers forming one signature family
    val media = (0 until 50).map(i => (i.toLong, png(40 + i))).toDF("img_id", "png")
    val acc = spark.sparkContext.longAccumulator(Dedup.SkippedBucketsAcc)
    val capped = MediaDedup.imageDedup(media, "img_id", "png", maxDist = 0,
      maxBucket = 10, skippedAcc = Some(acc))
    assert(capped.filter($"action" === "near_dup").count() === 0L)
    assert(acc.value === 1)
    // uncapped: every keeper except the smallest id is a near_dup of 0
    val open = MediaDedup.imageDedup(media, "img_id", "png", maxDist = 0)
    assert(open.filter($"action" === "near_dup").count() === 49L)
  }
}
