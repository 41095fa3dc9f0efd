package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** A verdict row of the streaming cluster-quota gate: the vector's
  * cluster, its 1-based arrival sequence within that cluster, and
  * whether it was admitted (sequence ≤ quota). */
case class ClusterAdmit(vecId: Long, clusterId: Long, clusterSeq: Long, admitted: Boolean)

private[streaming] case class ClusterEvent(vecId: Long, clusterId: Long)

/** Per-cluster admission counter: ONE Long of state per cluster, no TTL
  * (a full cluster must stay full). Within a micro-batch, rows are
  * ordered by vec id so the admitted prefix is deterministic. */
class ClusterQuotaProcessor(quota: Int)
    extends StatefulProcessor[Long, ClusterEvent, ClusterAdmit] {

  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[ClusterEvent],
      timerValues: TimerValues): Iterator[ClusterAdmit] = {
    val out = Seq.newBuilder[ClusterAdmit]
    var c = if (seen.exists()) seen.get() else 0L
    for (ev <- rows.toSeq.sortBy(_.vecId)) {
      c += 1
      out += ClusterAdmit(ev.vecId, key, c, c <= quota)
    }
    seen.update(c)
    out.result().iterator
  }
}

/** Streaming cluster-balanced admission — the ingestion-time analog of
  * [[graft.operators.SemDedup.clusterSample]]: vectors flow in, each is
  * assigned its nearest centroid in a stateless broadcast scan, and
  * each CLUSTER admits only its first `quota` arrivals. The batch pass
  * selects a reproducible salted-md5 subset for a fixed corpus layout;
  * the stream gate enforces the same per-cluster cap on an unbounded
  * feed, where "first arrivals win" is the only causal rule available —
  * the same trade [[CurateStream]] documents for streaming exact dedup.
  * What the cap buys at ingest time is cost: once a semantic cluster
  * (one template, one boilerplate family) is full, its members stop
  * flowing into downstream dedup/scoring/storage entirely.
  *
  * Scale: centroids ride the closure as a driver array (the SemDeDup
  * broadcast-model shape, ≤ 4096 here); assignment never shuffles; the
  * only exchange is groupByKey(cluster_id) of (vecId, clusterId) pairs
  * — embeddings stay in the scan tasks. State is one counter per
  * cluster. Requires the RocksDB state store provider, like every
  * transformWithState operator here.
  */
object ClusterSampleStream {

  /** Gate a streaming (idCol, vecCol) frame at `quota` admissions per
    * nearest-centroid cluster. Emits a verdict row per arrival. */
  def gate(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], quota: Int): Dataset[ClusterAdmit] = {
    require(quota > 0, s"quota must be positive, got $quota")
    val spark = vecs.sparkSession
    import spark.implicits._
    graft.operators.SemDedup.assignClusters(vecs, idCol, vecCol, cents)
      .select(col("vec_id").as("vecId"), col("cluster_id").as("clusterId"))
      .as[ClusterEvent]
      .groupByKey(_.clusterId)
      // TimeMode.None: no timers, no TTL — processAllAvailable stays a
      // deterministic wait (see StreamSync's scaladoc)
      .transformWithState(new ClusterQuotaProcessor(quota),
        TimeMode.None(), OutputMode.Append())
  }
}
