package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.Dedup

/** One LSH band row of a streaming document (top-level for encoder
  * codegen): the bucket membership plus the doc's sorted shingle-hash
  * set for in-bucket verification and its full band-hash vector for
  * the canonical-band rule. */
final case class BandRow(band: Int, bucket: Long, sid: Long, gs: Array[Long],
    bhs: Array[Long])

/** A verified near-duplicate pair (da < db). */
final case class NearPair(da: Long, db: Long, jaccard: Double)

/** Streaming MinHash+LSH near-duplicate detection — the continuous form
  * of [[Dedup.minhashLshPairs]]: each arriving document's band rows are
  * routed to their (band, bucket) key, verified with an exact
  * sorted-merge Jaccard against the bucket's RETAINED members, and
  * appended to the bucket state. A near-dup of any document seen within
  * the retention TTL is caught as it arrives — the batch operator's
  * semantics, minus pairs whose first member aged out of state (the
  * documented unbounded-ingest trade, same as
  * [[DedupStream.withinWatermark]]: global pairing over all history is
  * the batch compaction's job).
  *
  * State is per (band, bucket): a list of (sid, shingle hashes) — the
  * compact rows, never the text. Bucket population is bounded by LSH
  * design plus the TTL; the per-arrival verify cost is the bucket size.
  *
  * CHECKPOINT COMPATIBILITY: the canonical-band rewrite changed both
  * the state row encoding ([[BandRow]] gained `bhs`) and the operator
  * graph (the downstream `dropDuplicates` — an unbounded state store —
  * is gone). Checkpoints written by the pre-rewrite operator cannot be
  * restored; upgrading a running query requires a FRESH checkpoint
  * directory (and re-ingesting whatever the retention window should
  * cover). This is the standard Structured Streaming contract for
  * state-schema/operator-graph changes, noted here because the rewrite
  * crossed it. (The round-8 `nSeen` counter state is a second such
  * crossing for pre-round-8 checkpoints.)
  */
class NearDupProcessor(threshold: Double, retention: java.time.Duration,
    maxBucket: Int = Int.MaxValue,
    skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
    extends StatefulProcessor[(Int, Long), BandRow, NearPair] {

  @transient private var members: ListState[BandRow] = _
  @transient private var nSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    members = getHandle.getListState[BandRow]("members",
      Encoders.product[BandRow], new TTLConfig(retention))
    nSeen = getHandle.getValueState[Long]("nSeen",
      Encoders.scalaLong, new TTLConfig(retention))
  }

  private def firstSharedBand(a: Array[Long], b: Array[Long]): Int = {
    var i = 0
    while (a(i) != b(i)) i += 1
    i
  }

  private def jaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { inter += 1; i += 1; j += 1 }
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
      timerValues: TimerValues): Iterator[NearPair] = {
    val out = Seq.newBuilder[NearPair]
    // streaming face of the batch kernels' maxBucket skew guard: past
    // the cap the bucket is SATURATED — membership is cleared and
    // arrivals drop (counted once, at the transition) until the TTL
    // retires the bucket. Bounds both the state row count and the
    // per-arrival verify under a boilerplate storm; the dropped pairs
    // are intra-mega-cluster, the batch compaction's job.
    var n = if (nSeen.exists()) nSeen.get() else 0L
    for (row <- rows) {
      if (n > maxBucket) { /* saturated: drop */ }
      else {
      val seen = members.get()
      while (seen.hasNext) {
        val m = seen.next()
        // canonical-band rule (same as the batch kernel): the pair is
        // owned by the FIRST band where the two vectors agree, so a
        // pair matching in several bands emits exactly once with no
        // downstream dedup state. One corner narrows: if the owner
        // band's member row aged out a clock tick before a later
        // band's, the pair is missed rather than emitted there —
        // band rows of one arrival share a timestamp, so the races
        // are tick-wide, and global pairing over all history is the
        // batch compaction's job anyway.
        if (m.sid != row.sid && firstSharedBand(m.bhs, row.bhs) == key._1) {
          val jac = jaccard(m.gs, row.gs)
          if (jac >= threshold) {
            val (da, db) = if (m.sid < row.sid) (m.sid, row.sid) else (row.sid, m.sid)
            out += NearPair(da, db, jac)
          }
        }
      }
      members.appendValue(row)
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

object NearDupStream {

  /** Default bucket-member retention: entries older than this are
    * evicted by the state store's native TTL. Bounded state is what
    * lets the operator run forever; widen per call for longer dedup
    * horizons. */
  val DefaultRetention: java.time.Duration = java.time.Duration.ofHours(24)

  /** docs(idCol: long, textCol: string) → verified near-dup pairs.
    * A pair surviving several bands emits ONCE via the canonical-band
    * rule — the emission belongs to the first band whose vectors
    * agree — so there is no downstream `dropDuplicates` and no
    * unbounded dedup state store; the operator's only state is the
    * TTL'd bucket membership. Doc ids are assumed unique per stream
    * (a re-ingested id re-pairs against surviving state, as in any
    * at-least-once source). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      retention: java.time.Duration = DefaultRetention,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[NearPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr(s"CAST($idCol AS LONG)", textCol).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.flatMap { case (sid, text) =>
          Dedup.minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
            .map { case (b, h, s, gs, bhs) => BandRow(b, h, s, gs, bhs) }
        }
      }
      .groupByKey(r => (r.band, r.bucket))
      .transformWithState(
        new NearDupProcessor(threshold, retention, maxBucket, skippedAcc),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
