package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    // corpus-text frames. Pin it once (persist + the count below
    // materializes it in one job) so [[Prefix]]'s range sampler and
    // checkpoint read cached blocks instead of re-running the full
    // count-and-join pipeline per consumer; unpersist before returning —
    // Prefix's eager checkpoint has consumed the cache by then, and no
    // CacheManager entry may outlive the call (TVF contract, as in
    // [[SpanDedup.dupSpans]]).
    val scores = BigramLm.scores(docs, idCol, textCol)
      .select(col("doc_id"), col("lm_mean"))
      .withColumn("__one", lit(1L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // the count both materializes the cache and sizes the rank stage:
      // the (doc_id, lm_mean) frame is ~24 bytes/row, so partitions of
      // ~2.7M rows hold ~64 MB — at sf0.1 that is ONE partition (no
      // 32-task scheduling floor on a 5k-row frame), at 10^9 docs ~370
      // (capped by the session's shuffle parallelism)
      val n0 = scores.count()
      val parts = math.max(1, math.min(
        docs.sparkSession.sessionState.conf.numShufflePartitions,
        (n0 / RowsPerRankPartition).toInt + 1))
      val (ranked, n) = Prefix.runningTotalAndSum(
        scores, Seq("lm_mean", "doc_id"), "__one", "rnk", parts)
      ranked.select(col("doc_id"), col("lm_mean"),
        expr(s"((rnk - 1) * $buckets) div ${math.max(n, 1L)}").as("bucket"))
    } finally scores.unpersist()
  }

  /** ~64 MB of (doc_id, lm_mean, __one) rows per rank partition. */
  private val RowsPerRankPartition = 2700000L
}
