package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed media deduplication — the crawl-scale front door for the
  * perceptual near-dup family: an EXACT content-hash lane first (at
  * crawl scale most image dups are byte-identical — blank thumbnails,
  * logos, tracking pixels — the text t2 discipline over the bytes
  * column), then the perceptual lane ([[ImageDedup]] dHash +
  * pigeonhole) over exact-lane keepers only.
  *
  * Scale shape: media bytes NEVER shuffle. The exact lane shuffles
  * (md5, id) rows only; the perceptual decode pass is shrunk by the
  * corpus duplication factor via per-partition content dedup (each
  * task decodes each distinct md5 it sees once — a local HashSet of
  * 16-byte digests, O(distinct-per-partition) memory), and the
  * per-content signature rollup + keeper join + verdict join all carry
  * hashes and ids only. The pair search inherits the distinct-signature
  * pigeonhole and its `maxBucket` skew guard from
  * [[ImageDedup.nearPairs]].
  *
  * Verdict per input row: `keep` — the exact keeper with no
  * smaller-id perceptual neighbor; `exact_dup` — byte-identical to a
  * smaller-id row (`dup_of` = that keeper); `near_dup` — an exact
  * keeper whose signature has a neighbor within `maxDist` Hamming at a
  * smaller keeper id (`dup_of` = the smallest such neighbor; the
  * SemDeDup-style keep-first dominance rule, v14 discipline). Rows
  * whose bytes no decoder accepts (or too-short media) have no
  * signature and stay `keep` unless byte-identical to an earlier row —
  * decoder totality never invents pairs. */
object MediaDedup {

  private def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** The generic composed dedup over any 64-bit perceptual signer
    * (`bytes => Option[Long]`; None = no signature, the totality
    * convention). Output: (media_id, action, dup_of) sorted upstream
    * by the caller. */
  def dedup(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      signer: Array[Byte] => Option[Long],
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val m = media.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .filter(col("id").isNotNull && col("bytes").isNotNull)
    // ONE media scan: md5 every row; decode (sign) only the first
    // occurrence of each content per partition — every family member is
    // byte-identical, so one decode per distinct md5 per task suffices
    // and the decode pass shrinks by the corpus duplication factor
    val scanned = m.as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        val seen = new java.util.HashSet[String]()
        rows.map { case (id, bytes) =>
          val ch = hex(md.digest(bytes))
          val sig = if (seen.add(ch)) signer(bytes) else None
          (id, ch, sig)
        }
      }
      .toDF("id", "chash", "sig")
      .localCheckpoint() // consumed three times (family agg, signature
    // rollup, verdict join); the blob scan must not re-run per consumer
    val fam = scanned.groupBy("chash").agg(min("id").as("keeper"))
    // per-content signature rollup dedups across partitions on hashes alone
    val contentSigs = scanned.filter(col("sig").isNotNull)
      .select(col("chash"), col("sig").cast("long").as("dhash"))
      .groupBy("chash").agg(min("dhash").as("dhash")) // all equal; min is deterministic
    val idHash = scanned.select(col("id"), col("chash"))
    val keeperSigs = contentSigs.join(fam, "chash").select(col("keeper"), col("dhash"))
    val pairs = ImageDedup.nearPairs(keeperSigs, maxDist,
      idCol = "keeper", sigCol = "dhash", maxBucket = maxBucket,
      skippedAcc = skippedAcc)
    // keep-first dominance: a keeper with any smaller-id neighbor drops
    val nearOf = pairs.groupBy(col("db").as("id")).agg(min(col("da")).as("near_of"))
    idHash.join(fam, "chash")
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as("media_id"),
        when(col("id") =!= col("keeper"), lit("exact_dup"))
          .when(col("near_of").isNotNull, lit("near_dup"))
          .otherwise(lit("keep")).as("action"),
        when(col("id") =!= col("keeper"), col("keeper"))
          .otherwise(col("near_of")).as("dup_of"))
  }

  /** Image flavor: decode → 9×8 dHash ([[ImageDedup.dhashSignatures]]
    * kernel). */
  def imageDedup(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    dedup(media, idCol, bytesCol, maxDist,
      b => graft.multimodal.Multimodal.JvmImageCodec.decodeImage(b)
        .map(graft.multimodal.Multimodal.JvmImageCodec.dHash),
      maxBucket, skippedAcc)

  /** Audio flavor: WAV/AIFF/AU decode → 64-window energy contour. */
  def audioDedup(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    dedup(media, idCol, bytesCol, maxDist,
      b => graft.multimodal.Multimodal.JvmAudioCodec.decode(b)
        .flatMap { case (_, pcm) => AudioDedup.fingerprint(pcm) },
      maxBucket, skippedAcc)

  /** Video flavor: MJPEG-in-AVI / animated-GIF decode → temporal
    * mean-luma contour. */
  def videoDedup(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    dedup(media, idCol, bytesCol, maxDist,
      b => graft.multimodal.Multimodal.JvmAviCodec.decodeMjpegAvi(b).map(_._2)
        .orElse(graft.multimodal.Multimodal.JvmGifCodec.decodeFrames(b))
        .orElse(graft.multimodal.Multimodal.JvmY4mCodec.decodeY4m(b).map(_._2))
        .flatMap(VideoDedup.fingerprint),
      maxBucket, skippedAcc)
}
