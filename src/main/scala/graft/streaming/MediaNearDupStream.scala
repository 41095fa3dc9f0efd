package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.ImageDedup

/** One pigeonhole chunk row of a streaming media item (top-level for
  * encoder codegen): bucket membership plus the full 64-bit signature
  * for in-bucket Hamming verification and the canonical-chunk rule. */
final case class MediaSigRow(chunk: Int, chunkVal: Long, mid: Long, sig: Long)

/** A verified media near-duplicate pair (da < db, Hamming distance). */
final case class MediaNearPair(da: Long, db: Long, hamming: Long)

/** Streaming perceptual media near-dup — the ingestion-time analog of
  * the batch [[ImageDedup.nearPairs]] pigeonhole kernel, completing the
  * batch/stream symmetry the text side already has
  * ([[NearDupStream]]): each arriving item's 64-bit signature fans out
  * to its maxDist+1 (chunk, chunkVal) buckets, is Hamming-verified
  * against the bucket's RETAINED members, and appended to bucket
  * state. A near-dup of anything seen within the retention TTL is
  * flagged ON ARRIVAL; pairs whose first member aged out are the
  * documented unbounded-ingest trade (global pairing over all history
  * is the batch compaction's job).
  *
  * State is per (chunk, chunkVal): a list of (mid, sig) — 16 bytes per
  * member, never media bytes. The chunk boundaries and canonical-chunk
  * rule are the BATCH kernel's own helpers
  * ([[ImageDedup.chunkBoundsFor]] / [[ImageDedup.firstSharedChunkOf]]),
  * so stream and batch agree on bucketing and single-emission by
  * construction. The `maxBucket` saturation guard is the
  * [[NearDupProcessor]] discipline: past the cap the bucket clears,
  * arrivals drop (counted once at the transition) until the TTL
  * retires it — an identical-thumbnail storm cannot grow state or the
  * per-arrival verify. */
class MediaNearDupProcessor(maxDist: Int, bounds: Array[Int],
    retention: java.time.Duration,
    maxBucket: Int = Int.MaxValue,
    skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
    extends StatefulProcessor[(Int, Long), MediaSigRow, MediaNearPair] {

  @transient private var members: ListState[(Long, Long)] = _
  @transient private var nSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    members = getHandle.getListState[(Long, Long)]("members",
      Encoders.product[(Long, Long)], new TTLConfig(retention))
    nSeen = getHandle.getValueState[Long]("nSeen",
      Encoders.scalaLong, new TTLConfig(retention))
  }

  override def handleInputRows(key: (Int, Long), rows: Iterator[MediaSigRow],
      timerValues: TimerValues): Iterator[MediaNearPair] = {
    val out = Seq.newBuilder[MediaNearPair]
    var n = if (nSeen.exists()) nSeen.get() else 0L
    for (row <- rows) {
      if (n > maxBucket) { /* saturated: drop */ }
      else {
        val seen = members.get()
        while (seen.hasNext) {
          val (mid, sig) = seen.next()
          val ham = java.lang.Long.bitCount(sig ^ row.sig)
          // canonical-chunk rule (the batch kernel's): the FIRST chunk
          // the two signatures share owns the pair's single emission
          if (mid != row.mid && ham <= maxDist
              && ImageDedup.firstSharedChunkOf(sig, row.sig, bounds) == key._1) {
            val (da, db) = if (mid < row.mid) (mid, row.mid) else (row.mid, mid)
            out += MediaNearPair(da, db, ham.toLong)
          }
        }
        members.appendValue((row.mid, row.sig))
        n += 1
        if (n > maxBucket) {
          members.clear()
          skippedAcc.foreach(_.add(1L))
        }
      }
    }
    nSeen.update(n)
    out.result().iterator
  }
}

object MediaNearDupStream {

  /** Default bucket-member retention — the [[NearDupStream]] horizon. */
  val DefaultRetention: java.time.Duration = java.time.Duration.ofHours(24)

  /** Signature-level entry: sigs(idCol: long, sigCol: long) →
    * on-arrival near-dup pairs. The media wrappers below feed it from
    * their decode pass; specs can drive it directly. */
  def sigPairs(sigs: DataFrame, idCol: String, sigCol: String, maxDist: Int,
      retention: java.time.Duration = DefaultRetention,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[MediaNearPair] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val bounds = ImageDedup.chunkBoundsFor(maxDist)
    val chunks = maxDist + 1
    sigs.selectExpr(s"CAST($idCol AS LONG)", s"CAST($sigCol AS LONG)")
      .as[(Long, Long)]
      .flatMap { case (mid, sig) =>
        (0 until chunks).map(c =>
          MediaSigRow(c, ImageDedup.chunkValAt(sig, c, bounds), mid, sig))
      }
      .groupByKey(r => (r.chunk, r.chunkVal))
      .transformWithState(
        new MediaNearDupProcessor(maxDist, bounds, retention, maxBucket, skippedAcc),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** The generic media entry over any 64-bit perceptual signer (None =
    * no signature — too-short or undecodable media never pair). The
    * decode runs in the arriving micro-batch's tasks; only (id, sig)
    * rows reach the shuffle and the state store. */
  def pairs(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      signer: Array[Byte] => Option[Long],
      retention: java.time.Duration = DefaultRetention,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[MediaNearPair] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sigs = media.selectExpr(s"CAST($idCol AS LONG) AS mid", s"$bytesCol AS bytes")
      .as[(Long, Array[Byte])]
      .flatMap { case (mid, bytes) =>
        if (bytes == null) None else signer(bytes).map(h => (mid, h))
      }
      .toDF("mid", "sig")
    sigPairs(sigs, "mid", "sig", maxDist, retention, maxBucket, skippedAcc)
  }

  /** Image flavor: decode → dHash (the [[ImageDedup.dhashSignatures]]
    * kernel inside the stream's tasks). */
  def imagePairs(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      retention: java.time.Duration = DefaultRetention,
      maxBucket: Int = Int.MaxValue): Dataset[MediaNearPair] =
    pairs(media, idCol, bytesCol, maxDist,
      b => graft.multimodal.Multimodal.JvmImageCodec.decodeImage(b)
        .map(graft.multimodal.Multimodal.JvmImageCodec.dHash),
      retention, maxBucket)

  /** Audio flavor: WAV/AIFF/AU decode → 64-window energy contour. */
  def audioPairs(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      retention: java.time.Duration = DefaultRetention,
      maxBucket: Int = Int.MaxValue): Dataset[MediaNearPair] =
    pairs(media, idCol, bytesCol, maxDist,
      b => graft.multimodal.Multimodal.JvmAudioCodec.decode(b)
        .flatMap { case (_, pcm) => graft.operators.AudioDedup.fingerprint(pcm) },
      retention, maxBucket)

  /** Video flavor: AVI/GIF container decode → temporal luma contour. */
  def videoPairs(media: DataFrame, idCol: String, bytesCol: String, maxDist: Int,
      retention: java.time.Duration = DefaultRetention,
      maxBucket: Int = Int.MaxValue): Dataset[MediaNearPair] =
    pairs(media, idCol, bytesCol, maxDist,
      b => graft.multimodal.Multimodal.JvmAviCodec.decodeMjpegAvi(b).map(_._2)
        .orElse(graft.multimodal.Multimodal.JvmGifCodec.decodeFrames(b))
        .orElse(graft.multimodal.Multimodal.JvmY4mCodec.decodeY4m(b).map(_._2))
        .flatMap(graft.operators.VideoDedup.fingerprint),
      retention, maxBucket)
}
