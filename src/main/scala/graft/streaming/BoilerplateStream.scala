package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.Boilerplate

/** A boilerplate-cleaned streaming document. */
case class BoilerplateCleaned(docId: Long, cleanText: String, nChunks: Long, nDropped: Long)

/** Streaming boilerplate gate — the deployment shape of
  * [[graft.operators.Boilerplate]] (C4's frequency rule): the bad-chunk
  * set is TRAINED offline on a reference corpus (chunk doc-frequency ≥
  * threshold, driver-sized by construction — boilerplate is the head of
  * the chunk distribution) and applied online as a completely STATELESS
  * narrow map: each arriving document re-hashes its own chunks with the
  * batch kernel and cuts the flagged ones. No shuffle, no state store,
  * nothing to time out — the same train-offline/broadcast/gate shape as
  * [[QualityGateStream]] and [[CrossDedupStream]].
  *
  * Deviation, stated plainly: the gate is frozen at training time — a
  * chunk that BECOMES frequent only within the stream is not cut (true
  * streaming frequency would need stateful counting with a watermark
  * horizon; retrain and re-broadcast on the batch side instead, which
  * is how C4-style pipelines actually operate). 64-bit chunk identity
  * (the batch `wideHash` widening does not apply to the frozen set).
  */
object BoilerplateStream {

  /** Offline training: collect the bad-chunk hashes of a reference
    * corpus, sorted for binary-search probing. `maxEntries` guards the
    * driver fold — at 8 bytes/entry the default 4M caps the broadcast
    * at 32 MB; a set that big means the threshold is too low, not that
    * the stream should shuffle. */
  def trainBadChunks(ref: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Long, maxEntries: Int = 1 << 22): Array[Long] = {
    val rows = Boilerplate.badChunkHashes(ref, idCol, textCol, k, maxDocFreq)
      .limit(maxEntries + 1)
      .collect()
    require(rows.length <= maxEntries,
      s"bad-chunk set exceeds maxEntries=$maxEntries — raise the doc-frequency " +
        "threshold or clean this corpus in batch")
    val hs = rows.map(_.getLong(0))
    java.util.Arrays.sort(hs)
    hs
  }

  /** Stateless gate: cut every trained chunk from each arriving
    * document. Emits one row per input document (empty `cleanText`
    * when everything was boilerplate), so downstream stages keep their
    * row accounting. */
  def clean(docs: DataFrame, idCol: String, textCol: String, k: Int,
      badChunks: Array[Long], minChunkTokens: Int = 2): Dataset[BoilerplateCleaned] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bc = spark.sparkContext.broadcast(badChunks)
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val (clean, n, dropped) = Boilerplate.cleanDoc(text, k, minChunkTokens,
          h => java.util.Arrays.binarySearch(bc.value, h) >= 0)
        BoilerplateCleaned(id, clean, n, dropped)
      }
  }
}
