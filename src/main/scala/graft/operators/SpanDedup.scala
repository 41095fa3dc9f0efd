package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact-substring (span) deduplication — the token-window formulation
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (ACL '22): any W-token window whose content occurs more than
  * once ANYWHERE in the corpus marks a duplicated region, and
  * overlapping/adjacent duplicated windows merge into maximal spans,
  * which a pipeline then cuts out of the training text. The single-node
  * reference algorithm is a corpus-wide suffix array; the distributed
  * equivalent is window hashing — the same duplicated-span output,
  * expressed as a groupBy instead of a suffix sort.
  *
  * Scale design (tested at 500-10k docs, written for 10^9+):
  *   - One narrow typed pass tokenizes each document where it is read
  *     and emits (doc_id, pos, hash64(window)) — ~20 bytes per token.
  *     The window STRINGS never leave the scan task; everything that
  *     shuffles is a fixed-width hash row.
  *   - Window frequency is a partial-aggregated `groupBy(hash).count`
  *     (map-side combine collapses each split's repeats before the
  *     exchange); duplicated positions come back via one equi-join on
  *     the hash — high-cardinality key, no skew beyond genuinely viral
  *     windows, which is exactly the data a dedup pass must see.
  *   - Span merge is a per-document gaps-and-islands window (lag +
  *     running break-count): partitioned by doc_id, so the sort is
  *     document-sized, never corpus-sized.
  *   - The window pass is consumed twice (frequency count + position
  *     join), so [[dupSpans]] persists it for exactly the duration of
  *     those two consumers: persist → one eager job that drives BOTH
  *     the count and the position join against the cache (pinning the
  *     duplicated-positions result, which truncates lineage) →
  *     `unpersist()` before returning. The cache lives only inside the
  *     operator call — nothing is left registered in the session's
  *     CacheManager, so a long-lived SQL session calling the
  *     `span_dedup` TVF cannot accumulate corpus-sized cache entries
  *     (the round-4 leak this replaces). What remains pinned is the
  *     (doc_id, pos) duplicated-positions frame — fixed-width rows
  *     bounded by the corpus's actual duplication, reclaimed by the
  *     ContextCleaner with its checkpoint RDD. The groupBy/join-back
  *     shape is kept over a `count() OVER (PARTITION BY h)` window
  *     because a genuinely viral window hash would pin one WindowExec
  *     task; the join path partial-aggregates map-side and lets AQE
  *     skew-split the probe.
  *
  * Identity is a 64-bit xxHash (collision odds ~n²/2^64 — at 10^12
  * corpus windows that is ~3%-per-corpus of ONE false window match,
  * which the span-merge absorbs unless it happens adjacent to a real
  * span; a pipeline that cannot tolerate it passes `wideHash = true`,
  * which widens the identity to 128 bits — two independent xxHash
  * seeds, count and join keyed on BOTH — at ~n²/2^128 collision odds
  * with the identical plan shape, +8 bytes per shuffled window row).
  * The DuckDB oracle groups by the window text itself, so a
  * hash-parity failure would surface as a CORRECTNESS mismatch.
  */
object SpanDedup {

  /** The per-document window kernel shared by the batch operator and
    * [[graft.streaming.SpanDedupStream]]: one (id, pos, hash64(window))
    * triple per W-token window, pos 1-based to match the oracle's
    * `unnest(range(...))` indexing; documents with fewer than `w`
    * tokens emit nothing. */
  private[graft] def windowOccs(id: Long, text: String, w: Int): Iterator[(Long, Int, Long)] = {
    val toks = Dedup.wsTokens(text)
    val last = toks.length - w
    if (last < 0) Iterator.empty
    else Iterator.tabulate(last + 1) { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
      (id, i + 1, Dedup.hash64(sb.toString))
    }
  }

  /** One row per W-token window: (doc_id, pos, h). */
  def windowRows(docs: DataFrame, idCol: String, textCol: String, w: Int): Dataset[(Long, Int, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) => windowOccs(id, text, w) }
  }

  /** [[windowOccs]] with the 128-bit identity: (id, pos, h, h2), the two
    * halves drawn from independent xxHash seeds over the same window. */
  private def windowOccsWide(id: Long, text: String, w: Int): Iterator[(Long, Int, Long, Long)] = {
    val toks = Dedup.wsTokens(text)
    val last = toks.length - w
    if (last < 0) Iterator.empty
    else Iterator.tabulate(last + 1) { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
      val s = sb.toString
      (id, i + 1, Dedup.hash64(s), Dedup.hash64Seeded(s, 1042L))
    }
  }

  /** Maximal duplicated spans per document: windows whose content occurs
    * ≥ `minCount` times corpus-wide (any document, any position,
    * including twice within one document), merged when their token
    * ranges overlap or touch (successive duplicated positions ≤ w
    * apart). Returns (doc_id, span_start, span_end, span_tokens,
    * n_windows), token positions 1-based inclusive. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minCount: Long = 2L, wideHash: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (win, keyCols) =
      if (wideHash) {
        val f = docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
          .flatMap { case (id, text) => windowOccsWide(id, text, w) }
          .toDF("doc_id", "pos", "h", "h2")
        (f, Seq("h", "h2"))
      } else
        (windowRows(docs, idCol, textCol, w).toDF("doc_id", "pos", "h"), Seq("h"))
    // Persist the window frame for exactly its two consumers, then let
    // one eager job (the localCheckpoint) run count + position join
    // against the cache; unpersist before returning so no CacheManager
    // entry outlives the call (TVF-safe — see the scaladoc).
    win.persist(StorageLevel.MEMORY_AND_DISK)
    val dup =
      try {
        val dupKeys = win.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
          .filter(col("c") >= minCount)
          .select(keyCols.map(col): _*)
        win.join(dupKeys, keyCols).select(col("doc_id"), col("pos"))
          .localCheckpoint()
      } finally win.unpersist()
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val running = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= w, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum(col("brk")).over(running))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + w - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
  }

  /** Apply-side of the Lee et al. pipeline: CUT duplicated spans out of
    * the corpus, keeping the FIRST occurrence of each window content
    * corpus-wide ((doc_id, pos) order — deterministic, engine-
    * independent) and removing the token ranges covered by every later
    * occurrence. Returns one row per input document:
    * (doc_id, clean_text [kept tokens space-joined — canonical
    * tokenized form on both engines], n_cut_tokens).
    *
    * Scale shape: the window pass and the keep-first rank shuffle
    * fixed-width hash rows on the window hash (same key as
    * [[dupSpans]]); covered positions are bounded by actual
    * duplication; the corpus shuffles ONCE on doc_id to meet its cut
    * list, and the token surgery itself is a codegen'd higher-order
    * `filter` — no typed map, no text in the dedup shuffles.
    *
    * The apply-side tokenization strips edge-empty tokens
    * (`array_remove(split(trim(text), "\\s+"), "")`) so it indexes
    * EXACTLY like [[Dedup.wsTokens]], which computed the cut positions:
    * Spark's `trim` strips spaces only and its `split` keeps trailing
    * empties, so a document with a leading tab or trailing newline
    * would otherwise shift every index by one and cut the wrong tokens
    * (`\\s+` splitting yields empty tokens only at the edges, so the
    * remove is a complete reconciliation, not a heuristic).
    *
    * `wideHash = true` widens the keep-first identity to 128 bits (two
    * independent xxHash seeds) like [[dupSpans]] — worth it here
    * because a collision is DESTRUCTIVE (it deletes a non-duplicate
    * span rather than merely widening a span boundary). */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String, w: Int,
      wideHash: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (win, keyCols) =
      if (wideHash) {
        val f = docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
          .flatMap { case (id, text) => windowOccsWide(id, text, w) }
          .toDF("doc_id", "pos", "h", "h2")
        (f, Seq("h", "h2"))
      } else
        (windowRows(docs, idCol, textCol, w).toDF("doc_id", "pos", "h"), Seq("h"))
    val byH = Window.partitionBy(keyCols.map(col): _*).orderBy(col("doc_id"), col("pos"))
    val cuts = win
      .withColumn("rn", row_number().over(byH))
      .filter(col("rn") > 1)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (w - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(collect_list(col("p")).as("cut_positions"))
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("cp", coalesce(col("cut_positions"), array().cast("array<int>")))
      .select(
        col("doc_id"),
        array_join(
          filter(array_remove(split(trim(col("text")), "\\s+"), ""),
            (t, i) => !array_contains(col("cp"), i + 1)),
          " ").as("clean_text"),
        size(col("cp")).cast("long").as("n_cut_tokens"))
  }

  /** Exact n-gram eval-set decontamination (the GPT-3 appendix-C /
    * Llama-style overlap check, DISTINCT from minhash-similarity
    * decontamination: here one shared W-token window anywhere is a hit):
    * flags every training document containing at least one W-token
    * window that also occurs anywhere in the eval corpus. Returns
    * (doc_id, n_hit_windows [distinct window contents],
    * n_hit_positions [total positions]) for contaminated docs only.
    *
    * Scale shape: eval sets are small by definition, so the eval side
    * collapses to a DISTINCT window-hash frame and BROADCASTS; the
    * train corpus pays ONE narrow window pass and a broadcast hash
    * join — the corpus itself never shuffles, and the groupBy
    * aggregates hit rows only (bounded by actual contamination).
    * Window identity is [[Dedup.hash64]] like [[dupSpans]] — the
    * oracle joins on window TEXT, so hash-collision parity failures
    * surface as correctness mismatches; `wideHash = true` widens the
    * identity to 128 bits (a collision here falsely flags a clean
    * training document) with the same broadcast shape, +8 bytes per
    * broadcast row. */
  def ngramContamination(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, w: Int, wideHash: Boolean = false): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    def wins(df: DataFrame, a: String, b: String, c: String, d: String) =
      if (wideHash)
        df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
          .flatMap { case (id, text) => windowOccsWide(id, text, w) }
          .toDF(a, b, c, d)
      else windowRows(df, idCol, textCol, w).toDF(a, b, c)
    val keyCols = if (wideHash) Seq("h", "h2") else Seq("h")
    val trainWin = wins(train, "doc_id", "pos", "h", "h2")
    val evalHashes = wins(eval, "eid", "epos", "h", "h2")
      .select(keyCols.map(col): _*).distinct()
    trainWin.join(broadcast(evalHashes), keyCols)
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col(keyCols.head), keyCols.tail.map(col): _*).as("n_hit_windows"),
        count(lit(1)).as("n_hit_positions"))
  }
}
