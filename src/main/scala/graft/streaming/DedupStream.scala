package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingest form of
  * [[graft.operators.Dedup.exactGroups]]: a document whose content hash
  * was already seen is dropped, across micro-batches.
  *
  * Two state policies, both on the built-in dedup operators so the
  * state store, not a hand-rolled map, carries the seen-set:
  *   - [[exact]]: `dropDuplicates` on the content hash — state grows
  *     with the number of DISTINCT documents and never expires. Right
  *     for bounded backfills.
  *   - [[withinWatermark]]: `dropDuplicatesWithinWatermark` — a repeat
  *     arriving within the watermark window of its first sighting is
  *     dropped, older state is evicted with the watermark. Right for
  *     unbounded ingest, where "the same crawl shard re-delivered
  *     shortly after" is the duplication mode and state must stay
  *     bounded; exact global dedup over an unbounded stream is then a
  *     periodic batch compaction over the sink (the standard split).
  *
  * Only the 128-bit hash enters state — never the document text (the
  * same shuffle-the-hash-not-the-text rule as the batch operator). */
object DedupStream {

  /** Content-hash column shared by both policies (md5 over the text
    * bytes, matching the batch operator and its oracle). */
  def contentHash(textCol: String): org.apache.spark.sql.Column =
    md5(col(textCol).cast("binary"))

  def exact(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("text_hash", contentHash(textCol))
      .dropDuplicates("text_hash")

  def withinWatermark(docs: DataFrame, textCol: String, eventTimeCol: String,
      delay: String): DataFrame =
    docs.withColumn("text_hash", contentHash(textCol))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")
}
