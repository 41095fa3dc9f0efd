package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, instr, lit}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

import graft.sources.Warc

/** A streamed, text-extracted web document. */
case class WarcDoc(warcFile: String, recNo: Long, targetUri: String, text: String)

/** Streaming WARC ingestion — the drop-directory front door of a
  * web-scale pipeline (the [[DiameterStream]] ingestion pattern applied
  * to the crawl side): `readStream(binaryFile)` over a directory that
  * WARC files land in → per-file record parse with the batch
  * [[Warc.parseStream]] kernel (plain or per-record-gzip, magic-
  * sniffed) → HTTP payload split → the C4-style
  * [[Warc.htmlToText]] chain. Completely STATELESS: each arriving file
  * is parsed where it lands, no shuffle, no state store — exactly-once
  * comes from the file-source's own tracking. Compose the output with
  * the curation gates ([[CurateStream]], [[BoilerplateStream]],
  * [[QualityGateStream]]) for the full ingest→curate live path.
  *
  * Scale note: `binaryFile` holds one whole file per row, so the
  * drop-dir contract is the CommonCrawl file size (~1 GB); a larger
  * single file belongs to the batch `recordsChunked` ranged path. */
object WarcStream {

  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** All records of every file dropped into `watchDir` (streaming). */
  def records(spark: SparkSession, watchDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(BinaryFileSchema)
      .load(watchDir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val in: java.io.InputStream = {
          val raw = new java.io.ByteArrayInputStream(bytes)
          if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
            new java.util.zip.GZIPInputStream(raw)
          else raw
        }
        Warc.parseStream(in, p)
      }
      .toDF()
  }

  /** The text-extracted response documents of every dropped file. */
  def textDocs(spark: SparkSession, watchDir: String): Dataset[WarcDoc] = {
    import spark.implicits._
    records(spark, watchDir)
      .filter(col("recType") === lit("response"))
      .select(col("warcFile"), col("recNo"), col("targetUri"),
        Warc.htmlToText(Warc.httpPayload(col("body").cast("string"))).as("text"))
      .as[WarcDoc]
  }

  /** Streaming BINARY media ingest — the q54 pipeline's front half as
    * a stream: response records whose HTTP Content-Type starts with
    * `ctypePrefix` (e.g. "image/"), payloads split binary-safely
    * ([[Warc.httpPayloadBytes]] — never string-round-tripped). Carries
    * the drop file's modificationTime as `arrival_ts`, the event-time
    * column the downstream watermark-bounded media gates
    * ([[MediaCurateStream.gateExactWithinWatermark]]) key on. */
  def mediaPayloads(spark: SparkSession, watchDir: String,
      ctypePrefix: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(BinaryFileSchema)
      .load(watchDir)
      .select("path", "modificationTime", "content")
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (p, mt, bytes) =>
        val in: java.io.InputStream = {
          val raw = new java.io.ByteArrayInputStream(bytes)
          if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
            new java.util.zip.GZIPInputStream(raw)
          else raw
        }
        Warc.parseStream(in, p).map(r =>
          (r.warcFile, r.recNo, r.recType, r.targetUri, r.body, mt))
      }
      .toDF("warc_file", "rec_no", "rec_type", "target_uri", "body", "arrival_ts")
      .filter(col("rec_type") === lit("response") &&
        Warc.hasContentType(col("body"), ctypePrefix))
      .select(col("warc_file"), col("rec_no"), col("target_uri"),
        Warc.httpPayloadBytes(col("body")).as("payload"), col("arrival_ts"))
  }
}
