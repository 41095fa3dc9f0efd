package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.queries.Text

/** Streaming curation gate — the continuous-ingest form of the composed
  * batch chain ([[graft.queries.Text.curateChain]] / the `curate` TVF):
  *
  *   quality score → language gate → exact dedup → split assignment
  *
  * The score/gate/hash prefix is the SAME code as batch
  * ([[Text.scoreAndGate]] — a stateless narrow pass, so it costs one
  * codegen'd map over each micro-batch), and the split rule is the same
  * md5-of-doc-id bucket, so a document admitted by the stream lands in
  * the same split the batch chain would give it.
  *
  * Dedup is the one stage whose semantics necessarily differ under
  * unbounded ingest: the batch chain keeps the MIN doc id per content
  * hash (a global decision), while a stream keeps the FIRST ARRIVAL
  * within the watermark horizon ([[DedupStream.withinWatermark]] — state
  * is evicted with the watermark, so it stays bounded; duplicates
  * separated by more than the horizon are the periodic batch
  * compaction's job, the same split documented on [[DedupStream]]).
  *
  * State carries only the 128-bit content hash — never document text.
  */
object CurateStream {

  /** Gate an unbounded document stream. `eventTimeCol` drives the
    * watermark; `delay` is the dedup horizon (e.g. "10 minutes"). */
  def gate(docs: DataFrame, eventTimeCol: String, delay: String): DataFrame =
    DedupStream.withinWatermark(
      // scoreAndGate already computed text_hash; dropping it lets the
      // dedup stage own the column it keys state on (same md5 rule)
      Text.scoreAndGate(docs).drop("text_hash"), "text", eventTimeCol, delay)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"),
        Text.splitCol.as("split"))
}
