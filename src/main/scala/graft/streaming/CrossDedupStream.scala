package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Streaming decontamination gate — the continuous form of
  * [[Dedup.minhashLshPairsAcross]] for the classic case where the
  * reference side is SMALL and FIXED: eval benchmarks, blocklists,
  * holdout sets. The reference corpus is banded ONCE into an LSH bucket
  * index and broadcast; each arriving document computes its band rows
  * in place and probes the index — a completely STATELESS narrow map
  * (no shuffle, no state store, nothing to time out), so a near-dup of
  * the reference is flagged the moment it arrives, forever, regardless
  * of how long the stream runs.
  *
  * Pairs emit once per (arriving doc, reference doc) — multi-band
  * collisions are deduplicated inside the probe kernel (a per-document
  * set), not by a stateful `dropDuplicates`.
  *
  * Contract: the index must fit a broadcast — bands·(24 + 8·|set|)
  * bytes per reference doc (~50 MB per 100k typical documents), which
  * eval-decontamination references always satisfy. A reference too
  * large to broadcast is the batch operator's job
  * ([[Dedup.minhashLshPairsAcross]] — boundary-only bucket join).
  */
object CrossDedupStream {

  /** `stream`(idCol, textCol) probed against static `reference`:
    * emits (da = arriving doc, db = reference doc, jaccard ≥ τ). */
  def decontaminate(stream: DataFrame, reference: DataFrame,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): Dataset[NearPair] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // index the fixed reference once: (band, bucket) -> members
    val refRows = reference.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.flatMap { case (sid, text) =>
          Dedup.minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
        }
      }
      .collect()
    val index: Map[(Int, Long), Array[(Long, Array[Long])]] =
      refRows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
        k -> rs.map(r => (r._3, r._4))
      }
    val bc = spark.sparkContext.broadcast(index)

    stream.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        val idx = bc.value
        rows.flatMap { case (sid, text) =>
          val checked = scala.collection.mutable.LongMap.empty[Boolean]
          val out = Seq.newBuilder[NearPair]
          Dedup.minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
            .foreach { case (band, bucket, _, gs, _) =>
              idx.getOrElse((band, bucket), Array.empty).foreach { case (refId, refGs) =>
                if (!checked.contains(refId)) {
                  checked.update(refId, true) // verify each ref member once
                  val jac = jaccard(gs, refGs)
                  if (jac >= threshold) out += NearPair(sid, refId, jac)
                }
              }
            }
          out.result()
        }
      }
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
}
