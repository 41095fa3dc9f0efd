package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the multimodal analog of
  * the text near-dup family (the LAION-style dedup step): every image
  * reduces to a 64-bit dHash
  * ([[graft.multimodal.Multimodal.JvmImageCodec.dHash]]) inside the
  * decode task, and near-duplicates are pairs within a small Hamming
  * radius, found by the pigeonhole rule (a pair within distance d
  * agrees exactly on at least one of d+1 bit-chunks) — the same
  * bucketed kernel discipline as [[Dedup.simhashSigPairs]], widened to
  * the full 64-bit signature.
  *
  * Scale: image bytes never shuffle — one narrow decode pass emits
  * (id, hash) rows; the pair search buckets by chunk value, compares
  * full hashes in-bucket only, and emits each pair once via the
  * canonical-chunk rule (no output distinct exchange). */
object ImageDedup {

  /** One narrow decode pass: (img_id, dhash). Undecodable or null
    * blobs emit nothing (decoder-totality convention). */
  def dhashSignatures(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.multimodal.Multimodal.JvmImageCodec.decodeImage(bytes)
          .map(img => (id, graft.multimodal.Multimodal.JvmImageCodec.dHash(img)))
      }
      .toDF("img_id", "dhash")
  }

  /** All (da < db) pairs within `maxDist` Hamming distance over 64-bit
    * signatures: chunk the hash into maxDist+1 bit-ranges (widths as
    * even as 64 allows), bucket-join on each chunk value, verify with
    * one popcount, emit once at the first agreeing chunk. */
  def nearPairs(sigs: DataFrame, maxDist: Int,
      idCol: String = "img_id", sigCol: String = "dhash"): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist must be in [0, 64), got $maxDist")
    val spark = sigs.sparkSession
    import spark.implicits._
    val chunks = maxDist + 1
    val bounds = (0 to chunks).map(c => c * 64 / chunks).toArray
    def chunkVal(sig: Long, c: Int): Long = {
      val width = bounds(c + 1) - bounds(c)
      if (width >= 64) sig
      else (sig >>> bounds(c)) & ((1L << width) - 1)
    }
    sigs.select(col(idCol).cast("long"), col(sigCol).cast("long"))
      .as[(Long, Long)]
      .flatMap { case (id, sig) =>
        (0 until chunks).map(c => (c, chunkVal(sig, c), id, sig))
      }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, it) =>
        val c = key._1
        val rows = it.map(r => (r._3, r._4)).toArray.sortBy(_._1)
        def firstSharedChunk(a: Long, b: Long): Int = {
          var k = 0
          while (chunkVal(a, k) != chunkVal(b, k)) k += 1
          k
        }
        val out = Iterator.newBuilder[(Long, Long, Long)]
        var i = 0
        while (i < rows.length) {
          var j = i + 1
          while (j < rows.length) {
            val ham = java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2)
            if (ham <= maxDist && rows(i)._1 != rows(j)._1
              && firstSharedChunk(rows(i)._2, rows(j)._2) == c)
              out += ((rows(i)._1, rows(j)._1, ham.toLong))
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("da", "db", "hamming")
  }
}
