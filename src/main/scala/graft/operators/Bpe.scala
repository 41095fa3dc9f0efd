package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BPE vocabulary induction (Sennrich et al., ACL '16) — the tokenizer-
  * training step of an LLM data pipeline, built the way a corpus-scale
  * trainer has to be built:
  *
  *   1. ONE pass reduces the corpus to the (word, count) DICTIONARY —
  *      the classic BPE trick: every later statistic is a weighted sum
  *      over distinct words, so the 100 TB corpus is touched exactly
  *      once and each merge round runs over a table bounded by the
  *      vocabulary (~10⁷-10⁸ rows with web noise), not the corpus.
  *   2. each merge round is a map-side-combined pair count over the
  *      dictionary's symbol sequences — only ((a, b), weight) rows
  *      shuffle — followed by a driver top-1 (count desc, pair asc:
  *      fully deterministic) and a narrow merge map.
  *   3. the evolving dictionary is localCheckpoint'ed per round (each
  *      round's top-1 action would otherwise replay the whole merge
  *      lineage from the corpus scan) and the previous round released;
  *      checkpoint blocks are dictionary-bounded and reclaimed by the
  *      ContextCleaner once train() returns its `numMerges` driver
  *      rows — nothing corpus-sized is ever cached.
  *
  * [[topPairs]] is the single-merge-step surface the t27 oracle
  * hash-checks (integer counts, no floats anywhere); [[train]] is the
  * iterative trainer whose per-round statistics are exactly that step.
  * Symbols are 1-UTF-16-unit substrings at round 0 — identical to the
  * oracle's per-character `substring` on the ASCII test corpus; a
  * non-BMP corpus would seed from code points instead (same plan).
  */
object Bpe {

  /** Corpus → (word, n) dictionary: the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))

  /** Adjacent-pair counts of one merge round, weighted by word count:
    * (a, b, cnt), the exact statistic BPE ranks. */
  private def pairCounts(vocab: Dataset[(Seq[String], Long)]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    vocab.flatMap { case (syms, n) =>
      Iterator.range(0, syms.length - 1).map(i => (syms(i), syms(i + 1), n))
    }.toDF("a", "b", "n")
      .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
  }

  /** One greedy left-to-right application of merge (a, b) — the
    * standard BPE merge semantics ("aaa" under (a,a) → ["aa", "a"]). */
  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The first merge step's statistic, top-k: corpus-wide adjacent
    * character-pair counts (weighted by word occurrences), ordered
    * (cnt desc, a, b). The t27 oracle surface. */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    wordCounts(docs, textCol).as[(String, Long)]
      .flatMap { case (t, n) =>
        Iterator.range(0, t.length - 1)
          .map(i => (t.substring(i, i + 1), t.substring(i + 1, i + 2), n))
      }.toDF("a", "b", "n")
      .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Encode one word under a RANK-INDEXED merge table: repeatedly merge
    * every occurrence of the lowest-rank adjacent pair present —
    * O(|word|²) regardless of |merges|, vs the naive rank-sequential
    * sweep's O(|merges|·|word|), which is the difference between a
    * per-word map lookup and 32k wasted passes under a production
    * vocabulary. Output-equivalent to rank-sequential application for
    * any TRAINED merge list: a merge's output symbol can only appear in
    * pairs learned AFTER it (higher rank), so picking the lowest
    * present rank never misses an earlier merge — the standard
    * tokenizer implementation shape, property-checked against the
    * sequential form in BpeSpec. */
  /** Longest run [[encodeWord]] merges as one unit. Web noise contains
    * unbroken multi-MB "words" (base64 blobs, minified JS); encodeWord
    * is O(|word|²), so an uncapped word is a task stalled for hours and
    * a per-character Seq the trainer materializes. Production
    * tokenizers pre-split oversized words the same way; the split is at
    * fixed character boundaries, so it is deterministic and loses no
    * text — only merges that would have crossed a chunk boundary. */
  private[graft] val MaxWordLen = 256

  /** `w` in ≤ [[MaxWordLen]] pieces (identity for normal words). */
  private[graft] def wordChunks(w: String): Iterator[String] =
    if (w.length <= MaxWordLen) Iterator.single(w) else w.grouped(MaxWordLen)

  private[graft] def encodeWord(w: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = Seq.tabulate(w.length)(i => w.substring(i, i + 1))
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else syms = applyMerge(syms, best._1, best._2)
    }
    syms
  }

  /** Tokenizer APPLY: encode text under a trained merge list — per
    * word (pre-split at [[MaxWordLen]]), seed with characters and run
    * the rank-indexed priority merge ([[encodeWord]]). The merge table
    * is driver data (`numMerges` rows) shipped ONCE per executor as a
    * `sparkContext.broadcast` — at a production 32k-100k merge
    * vocabulary a closure copy would re-serialize the map into every
    * task; the pass is narrow — one row per document, no shuffle at
    * all until whatever the caller does next. Returns (doc_id, symbols
    * ARRAY<STRING>, n_symbols). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksBc = spark.sparkContext.broadcast(rankTable(merges))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val ranks = ranksBc.value
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        Dedup.wsTokens(text).foreach(w =>
          wordChunks(w).foreach(c => out ++= encodeWord(c, ranks)))
        (id, out.toSeq, out.length.toLong)
      }
      .toDF("doc_id", "symbols", "n_symbols")
  }

  private[graft] def rankTable(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Symbol count of one word under a rank table — what [[encode]]
    * emits for it, without keeping the symbols. */
  private[graft] def countSymbols(w: String, ranks: Map[(String, String), Int]): Int = {
    var n = 0
    wordChunks(w).foreach(c => n += encodeWord(c, ranks).length)
    n
  }

  /** Iterative BPE trainer: `numMerges` rounds over the word-count
    * dictionary; returns the merge list in rank order. Deterministic:
    * ties break on (a, b) lexicographically. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = wordCounts(docs, textCol).as[(String, Long)]
      // oversized-word split BEFORE character seeding (see MaxWordLen) —
      // pairCounts sums weights, so duplicate chunk rows are harmless
      .flatMap { case (t, n) =>
        wordChunks(t).map(c => (Seq.tabulate(c.length)(i => c.substring(i, i + 1)), n))
      }
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var round = 0
      var done = false
      while (round < numMerges && !done) {
        val top = pairCounts(vocab)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          val prev = vocab
          vocab = prev.map { case (syms, n) => (applyMerge(syms, a, b), n) }
            // checkpoint, not just persist: each round's top-1 action
            // would otherwise replay the whole merge lineage from the
            // corpus scan, and the plan itself grows by a map per round
            .localCheckpoint()
          prev.unpersist()
        }
        round += 1
      }
      merges.toSeq
    } finally vocab.unpersist()
  }
}
