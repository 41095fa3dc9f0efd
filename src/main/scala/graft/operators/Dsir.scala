package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling, deterministic-score form
  * (DSIR, Xie et al. 2023, arXiv:2302.03169): score every raw-pool
  * document by how much more likely its hashed n-gram features are
  * under a TARGET-domain model than under the raw-pool model, then keep
  * the high-importance documents — the standard "make CommonCrawl look
  * like Wikipedia" selection step of a pre-training pipeline.
  *
  * Feature model: bag of hashed unigrams + bigrams (the paper's
  * construction), add-one smoothed per corpus. Determinism contract
  * (the [[BigramLm]] discipline): the paper's log-likelihood-ratio and
  * Gumbel resampling are transcendental/random; the engine scores each
  * feature occurrence with the FIXED-POINT probability ratio
  * `r_f = (p_target_fp · SCALE) div max(p_raw_fp, 1)` where
  * `p_fp = ((c+1)·SCALE) div (N+V)`, and a document's importance is
  * the integer mean of its occurrences' ratios — monotone in each
  * feature's true importance weight, order-independent, bit-identical
  * on both engines. Selection is relative to the global integer mean
  * (a broadcast one-row stats frame) instead of a sampled quota.
  *
  * Scale design: tokenization rides [[BigramLm.tokenRows]] (strings
  * never shuffle — fixed-width hash rows only); the two count tables
  * are partial-aggregated groupBys; the scoring join is a plain
  * equi-join on the feature hash (AQE skew-split handles the Zipf
  * head); denominators and the selection cut are one-row broadcasts.
  * SCALE³-class intermediates stay under 2^63 for corpora up to ~10^12
  * feature occurrences; beyond that swap the expressions to
  * DECIMAL(38,0) — same plan shape.
  */
object Dsir {

  val Scale: Long = BigramLm.Scale

  /** One (doc_id, f) row per feature OCCURRENCE: every unigram hash and
    * every bigram hash of the document. An empty document tokenizes to
    * the single empty token ([[Dedup.wsTokens]]) — its hash is filtered
    * so such documents carry no features (mirrored in the oracle's
    * `t <> ''`); no other token can ever be empty. */
  private val EmptyTokenHash = Dedup.hash64("")
  private def featRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = BigramLm.tokenRows(docs, idCol, textCol)
    t.filter(col("h1") =!= EmptyTokenHash).select(col("doc_id"), col("h1").as("f"))
      .unionAll(t.filter(col("h2").isNotNull).select(col("doc_id"), col("h2").as("f")))
  }

  /** Importance scores for every raw-pool document:
    * (doc_id, n_feats, w_sum, w_mean). Documents with no tokens emit no
    * row (they have no features to weigh). */
  def importanceScores(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val rf = featRows(raw, idCol, textCol)
    val tf = featRows(target, idCol, textCol)
    val tcnt = tf.groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val rcnt = rf.groupBy(col("f")).agg(count(lit(1)).as("cr"))
    // smoothing denominator N + V per corpus; guarded so an empty
    // corpus degrades to the uniform model instead of dividing by zero
    val tstat = tcnt.agg(greatest(coalesce(sum(col("ct")), lit(0L)) + count(lit(1)), lit(1L)).as("dt"))
    val rstat = rcnt.agg(greatest(coalesce(sum(col("cr")), lit(0L)) + count(lit(1)), lit(1L)).as("dr"))
    rf
      .join(tcnt, Seq("f"), "left") // unseen-in-target features smooth to c=0
      .join(rcnt, Seq("f")) // every raw feature is in its own count table
      .crossJoin(broadcast(tstat))
      .crossJoin(broadcast(rstat))
      .select(col("doc_id"),
        expr(s"(((coalesce(ct, 0) + 1) * $Scale) div dt * $Scale) " +
          s"div greatest(((cr + 1) * $Scale) div dr, 1)").as("r"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("r")).as("w_sum"))
      .select(col("doc_id"), col("n_feats"), col("w_sum"),
        expr("w_sum div n_feats").as("w_mean"))
  }

  /** [[importanceScores]] plus the selection flag: keep documents whose
    * importance exceeds the raw pool's global integer-mean importance. */
  def select(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val scores = importanceScores(raw, target, idCol, textCol)
    val cut = scores.agg(expr("sum(w_mean) div count(1)").as("gmean"))
    scores.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("n_feats"), col("w_sum"), col("w_mean"),
        (col("w_mean") > col("gmean")).as("selected"))
  }
}
