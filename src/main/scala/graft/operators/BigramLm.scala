package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language-model scoring — the KenLM-shaped quality
  * signal of a pre-training pipeline (CCNet-style perplexity filtering),
  * self-trained on the corpus it scores: pass 1 counts unigrams and
  * bigrams corpus-wide, pass 2 scores each document's bigrams under the
  * add-one-smoothed conditional probability p(w2|w1) = (c2+1)/(c1+V).
  *
  * Determinism contract: the usual mean-log-probability is a
  * transcendental; the engine keeps the score in FIXED-POINT integer
  * arithmetic instead — p_fp = ((c2+1)·SCALE) div (c1+V) — so every
  * intermediate is a BIGINT and the per-doc sum is order-independent,
  * hash-matching the oracle bit-for-bit. (Monotone in each bigram's
  * probability; documented deviation from log-space scoring.)
  *
  * Scale design:
  *   - ONE narrow typed pass tokenizes each document where it is read
  *     and emits a fixed-width row per token position: (doc_id,
  *     unigram-hash, bigram-hash|null). Strings never shuffle. The
  *     typed flatMap is a MEASURED choice (round 6, sf0.1,
  *     median-of-5, same window): the SQL `transform`-lambda form runs
  *     ~2× slower (higher-order functions evaluate interpreted, not
  *     codegen'd), and `posexplode` carrying the token array through
  *     the generate runs ~1.5× slower (the array rides along every
  *     exploded row) — 0.77s flatMap vs 1.32s transform vs 1.07s
  *     posexplode on t19. The general prefer-explode rule does not
  *     apply when per-element work needs lambda expressions.
  *   - Unigram and bigram count tables are partial-aggregated groupBys
  *     on 64-bit hashes; V falls out of the unigram table for free.
  *     At 100 TB the bigram table is billions of rows — it stays
  *     distributed and the score join is a plain equi-join on the hash
  *     (high cardinality; the head of the Zipf curve is exactly the
  *     data a count join must see, and AQE skew-split handles it).
  *   - The token pass is consumed by both count tables and the scoring
  *     join, and deliberately NOT persisted: the token table is
  *     corpus-sized (≈ one fixed-width row per token), so caching it is
  *     a memory/disk liability at scale and an unbounded leak in a
  *     long-lived SQL session (the bigram_lm_scores TVF has no
  *     unpersist hook). Each consumer re-runs the narrow tokenize scan
  *     instead — CPU-cheap relative to materializing the corpus.
  */
object BigramLm {

  val Scale = 1000000L

  /** Per-document fixed-point LM stats: (doc_id, n_bigrams, lm_sum,
    * lm_mean). Documents with < 2 tokens have no bigrams and no row. */
  /** The shared tokenize pass: one (doc_id, unigram-hash,
    * bigram-hash|null) row per token position. Also the training scan
    * of [[graft.streaming.QualityGateStream]]'s pruned model. */
  private[graft] def tokenRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // user-facing TVFs (bigram_lm_scores, dsir_select, …) run this over
    // arbitrary parquet, so null ids/text are expected — they carry no
    // tokens (the Phrases.tag convention)
    // NOT Par.spread here — measured this round (r17 opt): spreading
    // this projection cost t37 0.90→1.61 s and t19 0.96→1.09 s (the
    // three consumers pay extra exchange stages that exceed the
    // single-task tokenize they parallelize) — the same verdict as the
    // round-6 recompute-vs-materialize A/B above scores().
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Dedup.wsTokens(text)
        Iterator.tabulate(toks.length) { i =>
          val big =
            if (i + 1 < toks.length) Some(Dedup.hash64(toks(i) + " " + toks(i + 1)))
            else None
          (id, Dedup.hash64(toks(i)), big)
        }
      }
      .toDF("doc_id", "h1", "h2")
  }

  /** The add-one conditional probability in fixed point — the ONE
    * definition both the batch scorer and the streaming gate's pruned
    * model apply. */
  private[graft] def fixedPointP(c2: Long, c1: Long, v: Long): Long =
    ((c2 + 1) * Scale) / (c1 + v)

  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = tokenRows(docs, idCol, textCol)

    // Each count table re-runs the narrow tokenize scan (3 scans total
    // with the probe side) — a MEASURED choice, round 6, same-window
    // A/B at sf0.1: merging the two counts into one tagged aggregate
    // needs a localCheckpoint pin (the tag filters push below the
    // aggregate and split a would-be shared exchange), and the pin's
    // eager job + explode doubling cost MORE than the scan they save —
    // t19 0.79 vs 1.06, t28 1.15 vs 1.48 medians. Same verdict as the
    // round-5 t17 adjudication: recompute-the-narrow-scan beats
    // materializing anything vocabulary- or corpus-sized here.
    val c1 = rows.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    val c2 = rows.filter(col("h2").isNotNull)
      .groupBy(col("h2")).agg(count(lit(1)).as("c2"))

    rows.filter(col("h2").isNotNull)
      .join(c2, "h2")
      .join(c1, "h1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        expr(s"((c2 + 1) * $Scale) div (c1 + v)").as("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("lm_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_sum"),
        expr("lm_sum div n_bigrams").as("lm_mean"))
  }
}
