package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.operators.Ann

/** A streaming semantic match against the fixed reference corpus. */
case class SemMatch(vecId: Long, refId: Long, cosine: Double, clusterId: Long)

/** The cluster-partitioned reference index the gate broadcasts:
  * centroids plus each cluster's member vectors. */
case class SemIndex(cents: Array[Array[Float]],
    members: Array[Array[(Long, Array[Float])]]) {
  def size: Int = members.map(_.length).sum
}

/** Streaming SEMANTIC decontamination gate — [[CrossDedupStream]]'s
  * shape with embedding cosine instead of minhash Jaccard (the
  * SemDeDup/eval-leakage case where similarity is meaning, not
  * n-grams): the FIXED reference corpus is indexed ONCE into
  * cluster-partitioned vector lists (nearest-centroid cells — the
  * [[graft.operators.SemDedup]] geometry) and broadcast; each arriving
  * vector assigns itself to its nearest centroid in place and compares
  * against THAT cell's members only — a completely STATELESS narrow
  * map: no shuffle, no state store, nothing to time out.
  *
  * Contract: the index must fit a broadcast — ~(8 + 4·dim) bytes per
  * reference vector (~70 MB per 256k 64-dim vectors), which
  * eval/holdout references satisfy; a reference too large to broadcast
  * is the batch operator's job. Cell pruning trades recall exactly as
  * in SemDeDup: a near-dup pair straddling a cell boundary is missed —
  * raise `numClusters` resolution or probe more cells in the batch
  * path when that matters. */
object SemDedupStream {

  /** Offline: index the reference with the deterministic lowest-id
    * seed rule (or pass pre-trained centroids via the overload).
    * `maxEntries` guards the driver fold loudly. */
  def buildIndex(reference: DataFrame, idCol: String, vecCol: String,
      numClusters: Int, maxEntries: Int = 1 << 18): SemIndex = {
    require(numClusters > 0 && numClusters <= 4096, s"numClusters out of range: $numClusters")
    val rows = reference.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .limit(maxEntries + 1)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(rows.length <= maxEntries,
      s"reference exceeds maxEntries=$maxEntries vectors — too large for a broadcast " +
        "gate; run the batch SemDedup/ANN path instead")
    val cents = rows.sortBy(_._1).take(numClusters).map(_._2)
    buildIndexWithCentroids(rows, cents)
  }

  /** Offline index with caller-trained centroids. */
  def buildIndexWithCentroids(rows: Array[(Long, Array[Float])],
      cents: Array[Array[Float]]): SemIndex = {
    require(cents.nonEmpty, "at least one centroid")
    val buckets = Array.fill(cents.length)(Seq.newBuilder[(Long, Array[Float])])
    rows.foreach { case (id, v) => buckets(Ann.nearestCell(cents, v)) += ((id, v)) }
    SemIndex(cents, buckets.map(_.result().toArray))
  }

  /** Stateless gate: emit every (arriving, reference) pair with cosine
    * ≥ `tau` inside the arriving vector's cell. Downstream drops or
    * quarantines flagged ids. */
  def matches(stream: DataFrame, index: SemIndex, idCol: String, vecCol: String,
      tau: Double): Dataset[SemMatch] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    stream.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val idx = bc.value
        val cell = Ann.nearestCell(idx.cents, v)
        idx.members(cell).iterator.flatMap { case (refId, refV) =>
          val cos = Ann.cosineD(v, refV)
          if (cos >= tau) Some(SemMatch(id, refId, cos, cell.toLong)) else None
        }
      }
  }
}
