package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.JvmImageCodec
import graft.operators.MediaCurate

/** The composed media curation chain: gate-before-pair ordering (a
  * gated mega-family never reaches the pair search), verdict totality,
  * and lane composition on a planted corpus. */
class MediaCurateSpec extends AnyFunSuite {
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

  private def uniform(v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 9).foreach(x =>
      img.setRGB(x, y, (v << 16) | (v << 8) | v)))
    JvmImageCodec.encodePng(img)
  }

  test("gate → exact → perceptual composition on a planted corpus") {
    val media = Seq(
      (1L, png(40)), (2L, png(40)), // exact family, survives gates
      (3L, png(50)), // same dHash as 1 (near at ham 0), different bytes
      (4L, png(200, up = false)), // far gradient: keeps
      (5L, uniform(128)), (6L, uniform(128)), // gated family (spread 0)
      (7L, Array[Byte](3, 3, 3))) // undecodable → gated
      .toDF("img_id", "png")
    val got = MediaCurate.imageCurate(media, "img_id", "png",
      minW = 8, minH = 8, minSpread = 10, maxAspect = 4, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(got === Seq((1L, "keep", -1L), (2L, "exact_dup", 1L),
      (3L, "near_dup", 1L), (4L, "keep", -1L),
      (5L, "gated", -1L), (6L, "gated", -1L), (7L, "gated", -1L)))
  }

  test("a gated mega-family never reaches the pair search") {
    // 500 byte-DISTINCT uniform placeholders: all share dHash 0 — the
    // classic blank-thumbnail storm. Gated up front, the pigeonhole
    // kernel sees ZERO rows: no skipped-bucket counts even at a tiny cap
    val media = ((0 until 500).map(i => (i.toLong, uniform(50 + i % 100)))
      :+ (9000L, png(40)) :+ (9001L, png(40)))
      .toDF("img_id", "png")
    val acc = spark.sparkContext.longAccumulator(
      graft.operators.Dedup.SkippedBucketsAcc)
    val got = MediaCurate.imageCurate(media, "img_id", "png",
      minW = 8, minH = 8, minSpread = 10, maxAspect = 4, maxDist = 3,
      maxBucket = 4, skippedAcc = Some(acc))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(acc.value === 0L)
    assert(got.count(_._2 == "gated") === 500)
    assert(got(9000L) === "keep" && got(9001L) === "exact_dup")
  }
}
