package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual video near-duplicate detection — the temporal leg of the
  * multimodal dedup family: each clip reduces to a 64-bit TEMPORAL
  * LUMA CONTOUR (64 frames; bit k set iff mean luma rises from frame k
  * to k+1 — the [[AudioDedup]] energy contour on the frame axis, which
  * is robust to spatial re-encodes because only the direction of
  * brightness change between frames matters), paired through the
  * shared 64-bit pigeonhole kernel ([[ImageDedup.nearPairs]]). Video
  * bytes never shuffle — one container decode per clip emits
  * (id, fingerprint). */
object VideoDedup {

  /** Integer mean luma of a frame (BT.601 integer weights, floor). */
  private[operators] def meanLuma(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    sum / (img.getWidth.toLong * img.getHeight)
  }

  /** Temporal contour over the first 64 frames: bit k (k ≤ 62) set iff
    * meanLuma(frame k+1) > meanLuma(frame k); bit 63 always clear.
    * Fewer than 64 frames → None: a clip too short to carry a contour
    * (< ~2.5 s at 24 fps — a common input class) has no fingerprint
    * (the decoder-totality convention), because a shared sentinel would
    * collapse every short clip into one Hamming-0 mega-family of false
    * near-dup pairs. */
  def fingerprint(frames: Seq[java.awt.image.BufferedImage]): Option[Long] = {
    if (frames.length < 64) return None
    val l = frames.take(64).map(meanLuma).toArray
    var h = 0L
    var k = 0
    while (k < 63) {
      if (l(k + 1) > l(k)) h |= 1L << k
      k += 1
    }
    Some(h)
  }

  /** One container-decode pass per clip: (img_id, dhash) — named to
    * feed [[ImageDedup.nearPairs]] directly. MJPEG-in-AVI first,
    * animated GIF as the fallback (both real JDK decoders); blobs
    * neither can read, null blobs, and clips shorter than 64 frames
    * emit nothing. */
  def signatures(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.multimodal.Multimodal.JvmAviCodec.decodeMjpegAvi(bytes)
          .map(_._2)
          .orElse(graft.multimodal.Multimodal.JvmGifCodec.decodeFrames(bytes))
          .orElse(graft.multimodal.Multimodal.JvmY4mCodec.decodeY4m(bytes).map(_._2))
          .flatMap(frames => fingerprint(frames).map(h => (id, h)))
      }
      .toDF("img_id", "dhash")
  }
}
