package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageDedup, MediaDedup}

/** Property checks for the composed media dedup and the guarded
  * pigeonhole kernel against naive references — the lane composition
  * (exact keeper = min id per byte content; near verdict = any
  * smaller-keeper neighbor within the radius over KEEPERS only) and the
  * distinct-signature pairing with its family fan-back are exactly the
  * kind of arithmetic a planted example can pass while an edge corpus
  * (duplicate signatures on different content, families of one,
  * signer-less blobs) silently breaks.
  *
  * The signer used is deterministic from the bytes (first 8 bytes as a
  * little-endian long; blobs shorter than 8 bytes have no signature),
  * so the reference can replay everything without Spark. */
object MediaDedupPropSpec {
  // top-level so the Spark closure captures a serializable reference,
  // not the scalatest suite
  def sigOf(b: Array[Byte]): Option[Long] =
    if (b.length < 8) None
    else Some((0 until 8).foldLeft(0L)((acc, i) => acc | ((b(i) & 0xffL) << (8 * i))))
}

class MediaDedupPropSpec extends AnyFunSuite {
  import MediaDedupPropSpec.sigOf

  private def naive(rows: Seq[(Long, Array[Byte])], maxDist: Int)
      : Map[Long, (String, Option[Long])] = {
    val byContent = rows.groupBy(_._2.toSeq)
    val keeperOf = rows.map { case (id, b) =>
      id -> byContent(b.toSeq).map(_._1).min
    }.toMap
    val keepers = keeperOf.values.toSet.toSeq
    val sigByKeeper = keepers.flatMap { k =>
      sigOf(rows.find(_._1 == k).get._2).map(k -> _)
    }.toMap
    rows.map { case (id, _) =>
      val k = keeperOf(id)
      if (id != k) id -> (("exact_dup", Some(k)))
      else {
        val near = for {
          (ok, os) <- sigByKeeper.toSeq
          s <- sigByKeeper.get(k)
          if ok < k && java.lang.Long.bitCount(os ^ s) <= maxDist
        } yield ok
        if (near.nonEmpty) id -> (("near_dup", Some(near.min)))
        else id -> (("keep", None))
      }
    }.toMap
  }

  // bytes from a tiny alphabet so byte-identical families, shared
  // signatures on DIFFERENT bytes (only bytes 8+ differ), and sub-8-byte
  // signer-less blobs all generate
  private val blobGen: Gen[Array[Byte]] = for {
    len <- Gen.oneOf(4, 8, 9, 12)
    head <- Gen.listOfN(math.min(len, 8), Gen.oneOf(Seq[Byte](0, 1, 2)))
    tail <- Gen.listOfN(math.max(0, len - 8), Gen.oneOf(Seq[Byte](9, 10, 11)))
  } yield (head ++ tail).toArray

  test("composed dedup equals the naive reference on random corpora") {
    val spark = SparkTest.spark
    import spark.implicits._
    val corpus = Gen.chooseNum(6, 18).flatMap(n => Gen.listOfN(n, blobGen))
    for (seed <- 1 to 8) {
      val blobs = corpus(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).get
      val rows = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      for (maxDist <- Seq(0, 3)) {
        val got = MediaDedup.dedup(rows.toDF("media_id", "bytes"),
          "media_id", "bytes", maxDist, sigOf)
          .collect().map(r => r.getLong(0) ->
            ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
          .toMap
        assert(got === naive(rows, maxDist), s"seed=$seed maxDist=$maxDist")
      }
    }
  }

  test("guarded kernel equals brute force with duplicate signatures across radii") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    for (round <- 1 to 4) {
      val bases = Seq.fill(5)(rnd.nextLong())
      val sigs = bases.flatMap(b => Seq(b, b, b ^ 1L, b ^ (1L << round),
        b ^ (1L << 17) ^ (1L << 49), rnd.nextLong()))
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      for (d <- Seq(0, 2, 5)) {
        val brute = (for {
          i <- sigs.indices; j <- (i + 1) until sigs.size
          ham = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
          if ham <= d
        } yield (sigs(i)._1, sigs(j)._1, ham.toLong)).toSet
        val got = ImageDedup.nearPairs(sigs.toDF("img_id", "dhash"), d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got === brute, s"round=$round maxDist=$d")
      }
    }
  }
}
