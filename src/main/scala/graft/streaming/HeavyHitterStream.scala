package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** A current heavy-hitter candidate: SpaceSaving brackets the true
  * count as `countLower ≤ true ≤ countUpper`. */
case class HhCandidate(bucket: Long, term: String, countUpper: Long, countLower: Long)

private[streaming] case class TermOcc(bucket: Long, term: String)

private[streaming] case class SsEntry(term: String, count: Long, err: Long)

/** Streaming heavy hitters — the ingestion-time analog of
  * [[graft.operators.Profiling.heavyHitters]]: SpaceSaving (Metwally
  * et al. 2005) with k counters per hash bucket, keyed by a stable
  * md5 bucket of the term so every occurrence of a term lands on the
  * same state partition.
  *
  * Guarantee transposed from the batch operator's Misra–Gries bound:
  * all occurrences of a term share its bucket, and the bucket's stream
  * is no longer than the whole stream, so ANY term with global count
  * > n/k exceeds its bucket length / k and SpaceSaving retains it —
  * the emitted candidate set is a superset of the true heavy hitters,
  * with per-term count brackets (`countLower ≤ true ≤ countUpper`,
  * the SpaceSaving overestimation invariant). The exact counts, as in
  * the batch design, come from a second pass — here the periodic batch
  * verification over the sink, the DedupStream compaction split.
  *
  * Scale: state is ≤ k (term, count, err) entries per bucket — B·k
  * rows TOTAL however long the stream runs (no TTL needed; that is
  * the point of the sketch). Only (bucket, term) pairs shuffle: the
  * text column is exploded to tokens inside the scan projection.
  * TimeMode.None — no timers, so `processAllAvailable` quiesces
  * (StreamSync.drain applies). Requires the RocksDB state store
  * provider, like every transformWithState operator here.
  */
class SpaceSavingProcessor(k: Int)
    extends StatefulProcessor[Long, TermOcc, HhCandidate] {

  @transient private var counters: ListState[SsEntry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counters = getHandle.getListState[SsEntry]("ss", Encoders.product[SsEntry], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TermOcc],
      timerValues: TimerValues): Iterator[HhCandidate] = {
    val state = mutable.HashMap.empty[String, (Long, Long)] // term -> (count, err)
    counters.get().foreach(e => state.update(e.term, (e.count, e.err)))
    // deterministic within-batch order (micro-batch rows arrive in
    // partition order): term asc, matching the spec fixtures. Any
    // order preserves the SpaceSaving guarantee.
    for (occ <- rows.toSeq.sortBy(_.term)) {
      state.get(occ.term) match {
        case Some((c, e)) => state.update(occ.term, (c + 1, e))
        case None if state.size < k => state.update(occ.term, (1L, 0L))
        case None =>
          // evict the minimum counter; the newcomer inherits its count
          // as overestimation error (min+1 ≥ its true count ≥ 1)
          val (minTerm, (minC, _)) = state.minBy { case (t, (c, _)) => (c, t) }
          state.remove(minTerm)
          state.update(occ.term, (minC + 1, minC))
      }
    }
    counters.clear()
    val entries = state.toSeq.sortBy(_._1).map { case (t, (c, e)) => SsEntry(t, c, e) }
    counters.appendList(entries.toArray)
    entries.iterator.map(e => HhCandidate(key, e.term, e.count, e.count - e.err))
  }
}

object HeavyHitterStream {

  /** 60-bit md5 bucket of the term — the engine's stable cross-engine
    * bucketing (Layout.md5Bucket parity pattern). */
  private def md5Bucket(term: org.apache.spark.sql.Column, buckets: Int) =
    conv(substring(md5(term), 1, 15), 16, 10).cast("long") % buckets

  /** Run the SpaceSaving gate over a streaming documents frame: emits
    * each bucket's CURRENT candidates (with count brackets) every
    * micro-batch it receives rows — update semantics; the latest
    * emission per (bucket, term) is the live estimate. */
  def candidates(docs: DataFrame, textCol: String, buckets: Int, k: Int): Dataset[HhCandidate] = {
    require(buckets >= 1 && k >= 2, s"need buckets >= 1 and k >= 2, got $buckets, $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .select(md5Bucket(col("term"), buckets).as("bucket"), col("term"))
      .as[TermOcc]
      .groupByKey(_.bucket)
      .transformWithState(new SpaceSavingProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
