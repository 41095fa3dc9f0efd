package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-tier bucketing — the CCNet move (Wenzek et al., LREC '20):
  * score every document under a corpus-trained LM, rank the corpus by
  * that score, and cut the ranking into equal-population tiers
  * (head/middle/tail), which downstream sampling then weights. Here the
  * score is [[BigramLm]]'s fixed-point corpus-bigram mean (monotone
  * stand-in for perplexity, deterministic across engines) and the tier
  * cut is an exact global rank.
  *
  * Scale design: the naive `ntile(k) OVER (ORDER BY score)` is a
  * SINGLE-TASK global sort of the corpus. The rank here is the
  * [[Prefix]] two-phase layout instead (range repartition by
  * (score, id), per-partition offsets folded on the driver, partition-
  * local windows), and the tier boundary is integer arithmetic on
  * (rank, N) — no corpus-sized anything on one task, plan-audited like
  * t15/t21. N falls out of the layout's own driver fold (it already
  * sums every partition), so no extra count job runs.
  */
object Quality {

  /** Per-document quality tier: (doc_id, lm_mean, bucket) with bucket in
    * [0, buckets), equal-population by construction (± rounding),
    * deterministic tie-break on doc_id. Documents with no bigrams
    * (< 2 tokens) carry no score and no row — [[BigramLm.scores]]
    * semantics. */
  def pplBuckets(docs: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    // The LM pass is the expensive part; its (doc_id, lm_mean) result is
    // doc-count-sized and two columns wide — bounded, unlike the t17
    // corpus-text frames. Pin it once so [[Prefix]]'s range sampler and
    // checkpoint job read cached blocks instead of re-running the full
    // count-and-join pipeline per consumer. The operator owns the frame
    // end-to-end; blocks are reclaimed by the ContextCleaner with the
    // checkpoint RDD, same lifecycle Prefix itself relies on.
    val scores = BigramLm.scores(docs, idCol, textCol)
      .select(col("doc_id"), col("lm_mean"))
      .withColumn("__one", lit(1L))
      .localCheckpoint()
    // N falls out of the rank layout's driver fold — no extra
    // distributed count job
    val (ranked, n) = Prefix.runningTotalAndSum(
      scores, Seq("lm_mean", "doc_id"), "__one", "rnk", 0)
    ranked.select(col("doc_id"), col("lm_mean"),
      expr(s"((rnk - 1) * $buckets) div ${math.max(n, 1L)}").as("bucket"))
  }
}
