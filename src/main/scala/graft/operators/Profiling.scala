package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Exact corpus-profiling operators that stay cheap at 100 TB — the two
  * statistics every curation run wants up front (what are the dominant
  * tokens? what does the length distribution look like?) computed
  * EXACTLY, with plans whose exchanged state is bounded by the answer
  * size, not the corpus size.
  *
  *   - [[heavyHitters]]: all terms with frequency > n/k, via the
  *     classic two-pass scheme — a per-partition Misra–Gries summary
  *     (k counters, constant memory) produces a candidate superset,
  *     then one exact counting pass over the candidates only. The
  *     output is EXACT and partitioning-independent even though the
  *     intermediate summaries are not.
  *   - [[quantilesDisc]]: exact discrete quantiles (percentile_disc
  *     semantics: the first value whose cumulative count reaches
  *     ⌈p·n⌉) over a value column via a distinct-value histogram —
  *     the only global exchange carries (value, count) rows, one per
  *     DISTINCT value, never the data itself.
  *
  * Both are deterministic integer arithmetic end-to-end, so a SQL
  * oracle replays them exactly.
  */
object Profiling {

  /** Misra–Gries summary of one partition: at most k counters; any item
    * whose count within the partition exceeds len(partition)/k is
    * guaranteed to survive (Misra & Gries 1982, "Finding repeated
    * elements"). Emits the surviving candidate terms.
    *
    * The superset guarantee composes across partitions: a term with
    * GLOBAL count > n/k must exceed n_p/k in at least one partition
    * (otherwise summing the per-partition bounds caps it at n/k), so
    * the union of per-partition candidates contains every global
    * heavy hitter regardless of how rows were split or ordered. */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None if counters.size < k => counters.update(t, 1L)
        case None =>
          // decrement-all: amortized O(1) per input — each decrement
          // pays down an earlier increment
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.filterInPlace((_, c) => c > 0L)
      }
    }
    counters.keysIterator
  }

  /** Candidate heavy-hitter terms: union of per-partition Misra–Gries
    * summaries — ≤ k candidates per partition, so the candidate set is
    * k·P rows however large the corpus. */
  def candidates(toks: Dataset[String], k: Int): DataFrame = {
    import toks.sparkSession.implicits._
    toks.mapPartitions(it => misraGries(it, k)).toDF("t").distinct()
  }

  /** All terms of `textCol` with occurrence count strictly greater than
    * total/k (the φ = 1/k heavy hitters), with their EXACT counts.
    *
    * Plan shape: pass 1 is a narrow scan holding k counters per task
    * and emitting ≤ k candidate strings per partition; pass 2 re-scans
    * with the candidate set broadcast, so the counting groupBy's key
    * space — and the shuffle — is bounded by the candidate count, not
    * the vocabulary. Compare the exact alternative (groupBy over the
    * full vocabulary then HAVING): that shuffles every distinct term
    * at 100 TB to keep ~k of them. The integer filter cnt·k > n makes
    * the result independent of the candidate superset's composition. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"heavyHitters needs k >= 2, got $k")
    import docs.sparkSession.implicits._
    // NOTE (r18 A/B): Par.spread of this tokenize REGRESSED t45
    // 0.87→0.95-1.33 s (alternating-window medians) even though three
    // consumers share the exchange — the three extra distributed stage
    // rounds cost more than the ~0.2 s single-task passes they
    // parallelize (the r17 BigramLm rule). Recompute-narrow kept.
    val toks = docs.select(explode(tokens(col(textCol))).as("t"))
    val cand = candidates(toks.as[String], k)
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cand), Seq("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(k.toLong) > col("n"))
      .select(col("t").as("term"), col("cnt"), col("n").as("total"))
  }

  /** Exact discrete quantiles of `valueCol` (any integral column) at
    * integer percentages `pcts`: for each p, the smallest value whose
    * cumulative count ≥ ⌈p·n/100⌉ — percentile_disc semantics, all
    * arithmetic integral.
    *
    * Plan shape: one partial-aggregated groupBy collapses the corpus
    * to its distinct-value histogram; the running-sum window then
    * orders THAT — a single-partition exchange, but of (value, count)
    * rows only (doc-length-like domains are thousands of distinct
    * values at any corpus size, the t15/t21 prefix-sum argument). The
    * rank probe is a broadcast of |pcts| rows. */
  /** Distinct-value histogram (v, c) of `valueCol` — the mergeable
    * reduction both the batch quantiles and their streaming deployment
    * accumulate (counts merge by ADDITION across micro-batches, so the
    * identical groupBy runs on a streaming frame under complete/update
    * mode — the Sketches.cmsGrid discipline). Null values are excluded
    * here, not at read-out: they must count toward neither the
    * histogram nor the rank denominator (the user-facing-TVF null
    * convention, Phrases/Boilerplate). */
  def valueHistogram(values: DataFrame, valueCol: String): DataFrame =
    values.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))

  /** Quantile read-out over a (v, c) histogram frame: for each p the
    * smallest v whose cumulative count reaches ⌈p·n/100⌉, with n
    * derived from the histogram itself (no second pass over the data).
    * The window's single-partition exchange carries the histogram
    * rows only. */
  def quantilesFromHistogram(hist: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percentages in [1,100], got $pcts")
    val cum = hist.withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
    val total = hist.agg(sum(col("c")).cast("long").as("n"))
    val probes = explode(array(pcts.distinct.sorted.map(p => lit(p)): _*)).as("pct")
    cum.crossJoin(broadcast(total.select(col("n"), probes)))
      .filter(col("cum") >= expr("(n * pct + 99) div 100"))
      .groupBy(col("pct"))
      .agg(min(col("v")).as("value"))
      .select(col("pct"), col("value"))
  }

  def quantilesDisc(values: DataFrame, valueCol: String, pcts: Seq[Int]): DataFrame =
    quantilesFromHistogram(valueHistogram(values, valueCol), pcts)

  /** Per-document token-count histogram — works identically on a batch
    * or STREAMING frame (complete/update mode accumulates the counts
    * across micro-batches; [[quantilesFromHistogram]] is the read-out). */
  def docLengthHistogram(docs: DataFrame, textCol: String): DataFrame =
    valueHistogram(docs.select(size(tokens(col(textCol))).as("len")), "len")

  /** Token-count-per-document quantile profile — the length
    * distribution a packing/sharding config is sized from. */
  def docLengthQuantiles(docs: DataFrame, textCol: String, pcts: Seq[Int]): DataFrame =
    quantilesFromHistogram(docLengthHistogram(docs, textCol), pcts)
}
