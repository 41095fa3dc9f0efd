package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageDedup

/** Perceptual image dedup: pigeonhole pair search vs brute force, edge
  * radii, and undecodable-blob totality. */
class ImageDedupSpec extends AnyFunSuite {

  private def sigRows(spark: org.apache.spark.sql.SparkSession, sigs: Seq[Long]) = {
    import spark.implicits._
    sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("img_id", "dhash")
  }

  private def brute(sigs: Seq[Long], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      i <- sigs.indices; j <- (i + 1) until sigs.size
      ham = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
      if ham <= maxDist
    } yield (i.toLong, j.toLong, ham.toLong)).toSet

  test("nearPairs equals brute force on random signatures across radii") {
    val spark = SparkTest.spark
    val rnd = new scala.util.Random(7)
    // clustered signatures: bases plus few-bit mutations → real pairs
    val bases = Seq.fill(8)(rnd.nextLong())
    // duplicate signatures included: the kernel must emit the ham-0
    // member pairs (family lane) AND their cross pairs to near sigs
    val sigs = bases.flatMap { b =>
      Seq(b, b, b ^ 1L, b ^ (1L << 17), b ^ (1L << 17) ^ (1L << 49), rnd.nextLong())
    }
    for (d <- Seq(0, 1, 3, 5)) {
      val got = ImageDedup.nearPairs(sigRows(spark, sigs), d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(sigs, d), s"mismatch at maxDist=$d")
    }
  }

  test("maxDist 0 is exact-duplicate detection (single 64-bit chunk)") {
    val spark = SparkTest.spark
    val sigs = Seq(5L, 5L, -1L, Long.MinValue, Long.MinValue)
    val got = ImageDedup.nearPairs(sigRows(spark, sigs), 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 1L, 0L), (3L, 4L, 0L)))
  }

  test("undecodable and null blobs emit no signature") {
    val spark = SparkTest.spark
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val png = graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    val media = Seq(
      (1L, Option(png)),
      (2L, Option(Array[Byte](1, 2, 3))),
      (3L, None: Option[Array[Byte]])).toDF("img_id", "png")
    val sigs = ImageDedup.dhashSignatures(media, "img_id", "png").collect()
    assert(sigs.map(_.getLong(0)).toSeq === Seq(1L))
  }
}
