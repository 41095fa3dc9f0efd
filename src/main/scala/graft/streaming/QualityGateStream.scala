package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, count, lit, min}

import graft.operators.{BigramLm, Dedup, Quality}

/** A tier-assigned streaming document. */
case class QualityTiered(docId: Long, lmMean: Long, tier: Int)

/** The pruned bigram-LM model the gate broadcasts: top unigram/bigram
  * counts by (count desc, hash asc) — deterministic — plus the FULL
  * vocabulary size (the smoothing denominator must not shrink with the
  * pruning). A missing entry scores as count 0, exactly add-one
  * smoothing's unseen case, so pruning only affects entries rare enough
  * to be near the unseen floor anyway. */
case class LmModel(c1: scala.collection.mutable.LongMap[Long],
    c2: scala.collection.mutable.LongMap[Long], v: Long) {

  /** Fixed-point lm_mean of `text` under this model — None for
    * documents with no bigram (< 2 tokens), matching
    * [[BigramLm.scores]] emitting no row for them. */
  def lmMean(text: String): Option[Long] = {
    val toks = Dedup.wsTokens(text)
    if (toks.length < 2) None
    else {
      var sum = 0L
      var i = 0
      while (i + 1 < toks.length) {
        val h1 = Dedup.hash64(toks(i))
        val h2 = Dedup.hash64(toks(i) + " " + toks(i + 1))
        sum += BigramLm.fixedPointP(c2.getOrElse(h2, 0L), c1.getOrElse(h1, 0L), v)
        i += 1
      }
      Some(sum / (toks.length - 1))
    }
  }
}

/** Streaming quality-tier gate — the deployment shape of CCNet-style
  * perplexity bucketing (Wenzek et al., LREC '20): tiers are TRAINED
  * offline (a batch [[Quality.pplBuckets]] pass over a reference
  * corpus yields k-1 lm_mean cut points, driver-sized) and applied
  * online — each arriving document is scored under the broadcast
  * pruned LM and assigned the tier its score falls in. A completely
  * STATELESS narrow map: no shuffle, no state store, nothing to time
  * out. Composes with [[SourceBudgetStream]] (tier-gate, then budget).
  *
  * Contracts and deviations, stated plainly:
  *   - the MODEL must fit a broadcast: 16 bytes per retained entry
  *     (~16 MB per million). Pruning is the deployment reality — CCNet
  *     ships a trained KenLM binary to every worker the same way; a
  *     pruned-away entry scores as unseen (count 0), so scores can
  *     deviate from the full-table batch score only on bigrams near
  *     the smoothing floor. With `maxEntries` ≥ the corpus vocabulary
  *     the streaming score is BIT-IDENTICAL to the batch score (the
  *     spec pins this).
  *   - tier assignment is BY VALUE (count of cut points ≤ score),
  *     while the batch rank breaks lm_mean TIES by doc_id; a document
  *     whose score equals a cut point exactly lands in the upper tier
  *     here but may straddle in the batch ranking. Equal-score ties at
  *     a tier boundary are the only divergence.
  */
object QualityGateStream {

  /** Train the broadcastable pruned model on a batch reference corpus:
    * top `maxEntries` unigrams and bigrams each, by (count desc, hash
    * asc). V is the FULL unigram vocabulary size. */
  def trainModel(docs: DataFrame, idCol: String, textCol: String,
      maxEntries: Int): LmModel = {
    val rows = BigramLm.tokenRows(docs, idCol, textCol)
    def top(keyed: DataFrame, key: String): scala.collection.mutable.LongMap[Long] = {
      val m = new scala.collection.mutable.LongMap[Long](maxEntries * 2)
      keyed.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col(key))
        .limit(maxEntries)
        .collect()
        .foreach(r => m.update(r.getLong(0), r.getLong(1)))
      m
    }
    val c1 = top(rows, "h1")
    val v = rows.select(col("h1")).distinct().count()
    val c2 = top(rows.filter(col("h2").isNotNull), "h2")
    LmModel(c1, c2, v)
  }

  /** The k-1 lm_mean cut points of a batch [[Quality.pplBuckets]] run,
    * labeled by their TRUE bucket id: (b, cut) where cut = the smallest
    * lm_mean ranked into bucket b. Driver-sized (≤ k-1 pairs). Buckets
    * left empty by a tiny corpus contribute no cut — returning pairs
    * (not a bare value array) keeps the surviving cuts attached to
    * their real bucket numbers instead of silently re-numbering them. */
  def thresholds(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): Array[(Long, Long)] = {
    Quality.pplBuckets(docs, idCol, textCol, buckets)
      .filter(col("bucket") >= 1)
      .groupBy(col("bucket")).agg(min(col("lm_mean")).as("cut"))
      .orderBy(col("bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  /** Gate a streaming documents frame: score each arrival under the
    * broadcast `model` and assign `tier` = the TRUE bucket id of the
    * highest cut ≤ score (0 = best tier under the fixed-point mean's
    * orientation, matching the batch bucket numbering). Taking
    * [[thresholds]]' (bucket, cut) pairs — not bare values — keeps the
    * streaming tier equal to the batch bucket id even when a sparse
    * training corpus left intermediate buckets empty: counting cuts
    * would silently renumber every tier above a missing one (the same
    * bug class the round-6 ADVICE flagged on the SQL surface).
    * Documents with < 2 tokens carry no score and are dropped, as in
    * the batch pass. */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      model: LmModel, cuts: Array[(Long, Long)]): Dataset[QualityTiered] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcModel = spark.sparkContext.broadcast(model)
    // cuts ascend with bucket id by construction (bucket ranks ascend
    // in lm_mean), so one forward walk finds the highest cut ≤ score
    val bcCuts = spark.sparkContext.broadcast(cuts.sortBy(_._2))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val m = bcModel.value
        val cs = bcCuts.value
        rows.flatMap { case (id, text) =>
          m.lmMean(text).map { mean =>
            var t = 0L
            var i = 0
            while (i < cs.length && cs(i)._2 <= mean) { t = cs(i)._1; i += 1 }
            QualityTiered(id, mean, t.toInt)
          }
        }
      }
  }
}
