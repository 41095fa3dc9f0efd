package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with *typed* metadata structs, and
  * the compute-heavy steps (decode, resize, frame-sample) run as
  * partition-wise batch transforms.
  *
  * The actual codec is STUBBED (this container ships no image/audio
  * libraries): `StubCodec` derives deterministic fake properties from the
  * bytes. Everything around it is real and load-bearing at scale —
  * the schema contract, the `mapPartitions` batch shape (one codec init
  * per partition, not per row — exactly how a JNI/FFmpeg/Pillow binding
  * must be amortized), and the repartition-by-size guard that keeps any
  * single task from holding too many large blobs.
  */
final case class MediaMeta(mimeType: String, width: Int, height: Int, durationMs: Long)
final case class MediaRecord(mediaId: Long, kind: String, content: Array[Byte])
final case class DecodedMedia(mediaId: Long, kind: String, content: Array[Byte],
    meta: MediaMeta, features: Array[Float])

object Multimodal {

  /** STUB — replace with a real codec binding. Deterministic: properties
    * are pure functions of the blob bytes. */
  object StubCodec {
    def sniffMime(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "image/jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "image/png"
      else "application/octet-stream"

    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      MediaMeta(sniffMime(bytes), 16 + math.abs(h % 1024), 16 + math.abs((h / 1024) % 1024),
        bytes.length.toLong)
    }

    /** Fake feature extractor: 8-dim byte-histogram-ish embedding. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { f((bytes(i) & 0xff) % 8) += 1f; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < 8) { f(j) /= bytes.length; j += 1 } }
      f
    }

    /** Fake resize: truncation keeping a deterministic prefix. */
    def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
      if (bytes.length <= maxBytes) bytes else java.util.Arrays.copyOfRange(bytes, 0, maxBytes)

    /** Fake frame sampler: every nth 1KiB slice as a "frame". */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(1024).zipWithIndex.collect { case (b, i) if i % everyN == 0 => b }.toSeq
  }

  /** Decode + featurize, one codec init per partition (the batch shape a
    * real binding needs). */
  def decode(ds: Dataset[MediaRecord])(implicit e: org.apache.spark.sql.Encoder[DecodedMedia]): Dataset[DecodedMedia] =
    ds.mapPartitions { it =>
      // real impl: initialize the native codec HERE, once per partition
      it.map(r => DecodedMedia(r.mediaId, r.kind, r.content,
        StubCodec.decodeMeta(r.content), StubCodec.features(r.content)))
    }

  /** Cap blob-per-task memory: repartition so a task holds roughly
    * `targetBytesPerTask` of content. At 100 TB this is what keeps
    * executors from OOMing on skewed media sizes. */
  def repartitionBySize(df: DataFrame, totalBytes: Long, targetBytesPerTask: Long): DataFrame = {
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerTask)).toInt)
    df.repartition(parts)
  }

  /** Column-level helpers usable without the typed API. */
  def contentLength = (c: org.apache.spark.sql.Column) => length(c)
  def contentHash = (c: org.apache.spark.sql.Column) => md5(c)
}
