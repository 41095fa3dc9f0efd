package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio near-duplicate detection — the audio leg of the
  * multimodal dedup story (chromaprint-lite): each clip reduces to a
  * 64-bit ENERGY-CONTOUR fingerprint inside the decode task (64 equal
  * sample windows; bit k set iff |energy| rises from window k to k+1 —
  * the dHash idea on the time axis), and near-duplicates are pairs
  * within a small Hamming radius via the shared 64-bit pigeonhole
  * kernel ([[ImageDedup.nearPairs]]).
  *
  * The contour is amplitude-scale- and DC-robust in the way that
  * matters for re-encoded copies (direction of energy change, not
  * absolute level) and every step is integral, so fingerprints are
  * bit-stable and closed-form-predictable for synthesized PCM. Audio
  * bytes never shuffle — one decode pass emits (id, fingerprint). */
object AudioDedup {

  /** 64-window energy contour of little-endian s16 mono PCM: windows
    * are [w·n/64, (w+1)·n/64) over the n samples; bit k (k ≤ 62) set
    * iff Σ|sample| of window k+1 exceeds window k's. Bit 63 is always
    * clear (63 comparisons), which also keeps the oracle's shift
    * arithmetic inside BIGINT. Fewer than 64 samples → None: a clip too
    * short to carry a contour has no fingerprint (the decoder-totality
    * convention), because a shared sentinel would collapse every short
    * clip into one Hamming-0 mega-family of false near-dup pairs. */
  def fingerprint(pcm: Array[Byte]): Option[Long] = {
    val n = pcm.length / 2
    if (n < 64) return None
    val e = new Array[Long](64)
    var w = 0
    while (w < 64) {
      val from = w * n / 64
      val until = (w + 1) * n / 64
      var i = from
      var sum = 0L
      while (i < until) {
        val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong
        sum += math.abs(s)
        i += 1
      }
      e(w) = sum
      w += 1
    }
    var h = 0L
    var k = 0
    while (k < 63) {
      if (e(k + 1) > e(k)) h |= 1L << k
      k += 1
    }
    Some(h)
  }

  /** One narrow decode pass: (img_id, dhash) — the column names feed
    * the shared pigeonhole kernel directly. Undecodable or null blobs,
    * and clips shorter than 64 samples, emit nothing (decoder-totality
    * convention). */
  def signatures(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.multimodal.Multimodal.JvmAudioCodec.decode(bytes)
          .flatMap { case (_, pcm) => fingerprint(pcm).map(h => (id, h)) }
      }
      .toDF("img_id", "dhash")
  }
}
