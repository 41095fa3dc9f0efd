package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-based boilerplate removal — the C4 rule ("we removed any
  * line that occurred three or more times", Raffel et al. 2020 §2.2)
  * generalised to whitespace corpora: split every document into
  * NON-OVERLAPPING k-token chunks, count each chunk's document
  * frequency corpus-wide, and remove EVERY occurrence of chunks that
  * appear in ≥ `maxDocFreq` distinct documents (navigation bars, cookie
  * banners, license footers).
  *
  * Distinct from [[SpanDedup.cutSpans]] (Lee et al. keep-FIRST span
  * dedup): this is doc-frequency-triggered and removes ALL occurrences
  * including the first — dedup keeps one copy of duplicated content,
  * boilerplate removal keeps none.
  *
  * `minChunkTokens` (default 2) is the short-tail guard: a document's
  * final chunk can be a single common word, and single high-frequency
  * words are vocabulary, not boilerplate.
  *
  * Scale shape (the [[SpanDedup.cutSpans]] discipline): the frequency
  * pass shuffles fixed-width (hash, doc_id) rows — never chunk text;
  * flagged positions join back bounded by actual boilerplate; the
  * corpus shuffles ONCE on doc_id to meet its drop list and the token
  * surgery is a codegen'd higher-order `filter`. Chunk identity is
  * [[Dedup.hash64]]; the oracle groups by chunk TEXT, so hash-collision
  * parity failures surface as correctness mismatches. `wideHash = true`
  * widens the identity to 128 bits (a collision here deletes innocent
  * text corpus-wide — destructive, like cutSpans).
  *
  * Returns one row per input document:
  * (doc_id, clean_text [kept tokens space-joined], n_chunks, n_dropped).
  */
object Boilerplate {

  /** Non-overlapping chunk kernel: one (id, idx, hashes…) per k-token
    * chunk, idx 0-based; the tail chunk may be short. Tokenization is
    * [[Dedup.wsTokens]] — the parity-critical kernel. */
  private def chunkOccs(id: Long, text: String, k: Int, wide: Boolean)
      : Iterator[(Long, Int, Long, Long)] = {
    if (text == null) return Iterator.empty // user-facing TVF input
    val toks = Dedup.wsTokens(text)
    if (toks.length == 0 || toks(0).isEmpty) Iterator.empty
    else {
      val n = (toks.length + k - 1) / k
      Iterator.tabulate(n) { i =>
        val s = toks.slice(i * k, math.min((i + 1) * k, toks.length)).mkString(" ")
        (id, i, Dedup.hash64(s), if (wide) Dedup.hash64Seeded(s, 1042L) else 0L)
      }
    }
  }

  /** Scala-side single-document surgery sharing the kernel's hashes and
    * guard arithmetic — the streaming gate's apply step
    * ([[graft.streaming.BoilerplateStream]]). `bad` answers "is this
    * 64-bit chunk hash boilerplate". */
  private[graft] def cleanDoc(text: String, k: Int, minTok: Int,
      bad: Long => Boolean): (String, Long, Long) = {
    if (text == null) return ("", 0L, 0L)
    val toks = Dedup.wsTokens(text)
    if (toks.length == 0 || toks(0).isEmpty) ("", 0L, 0L)
    else {
      val n = (toks.length + k - 1) / k
      val sb = new java.lang.StringBuilder
      var dropped = 0L
      var i = 0
      while (i < n) {
        val end = math.min((i + 1) * k, toks.length)
        val s = toks.slice(i * k, end).mkString(" ")
        if (bad(Dedup.hash64(s)) && (end - i * k) >= minTok) dropped += 1
        else {
          if (sb.length > 0) sb.append(' ')
          sb.append(s)
        }
        i += 1
      }
      (sb.toString, n.toLong, dropped)
    }
  }

  /** The corpus-wide bad-chunk identity frame (one `h` column): chunks
    * whose document frequency reaches `maxDocFreq`. Shared by
    * [[remove]]'s join-back and the streaming gate's offline training. */
  def badChunkHashes(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull) // user-facing TVF input (the Phrases convention)
      .as[(Long, String)]
      .flatMap { case (id, text) => chunkOccs(id, text, k, wide = false) }
      .toDF("doc_id", "idx", "h", "h2")
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .filter(col("doc_freq") >= maxDocFreq)
      .select(col("h"))
  }

  def remove(docs: DataFrame, idCol: String, textCol: String, k: Int,
      maxDocFreq: Long, minChunkTokens: Int = 2, wideHash: Boolean = false): DataFrame = {
    require(k > 0 && maxDocFreq > 0, "k and maxDocFreq must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyCols = if (wideHash) Seq("h", "h2") else Seq("h")
    require(minChunkTokens <= k, "minChunkTokens cannot exceed the chunk size")
    val chunks = docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull) // user-facing TVF input (the Phrases convention)
      .as[(Long, String)]
      .flatMap { case (id, text) => chunkOccs(id, text, k, wideHash) }
      .toDF("doc_id", "idx", "h", "h2")
    // doc frequency per chunk identity: fixed-width rows, map-side
    // partial distinct then one hash exchange on the chunk hash
    val badIds = chunks
      .groupBy(keyCols.map(col): _*)
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .filter(col("doc_freq") >= maxDocFreq)
      .select(keyCols.map(col): _*)
    // flagged (doc_id, idx) — join reuses the frequency pass's hash
    // partitioning; output bounded by actual boilerplate occurrences
    val dropIdx = chunks.join(badIds, keyCols)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("idx")).as("drop_idx"))
    // null text reads as empty on the apply side, matching the kernel's
    // no-chunks treatment (user-facing TVF input)
    docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(col(textCol), lit("")).as("text"))
      .filter(col("doc_id").isNotNull)
      .join(dropIdx, Seq("doc_id"), "left")
      .withColumn("toks", array_remove(split(trim(col("text")), "\\s+"), ""))
      .withColumn("n_chunks", ((size(col("toks")) + (k - 1)) / k).cast("long"))
      // re-apply the short-tail guard on the APPLY side with the same
      // arithmetic the kernel used: a flagged chunk is only cut when it
      // has >= minChunkTokens tokens in this document
      .withColumn("cut_idx",
        filter(coalesce(col("drop_idx"), array().cast("array<int>")),
          i => (size(col("toks")) - i * k) >= minChunkTokens))
      .select(
        col("doc_id"),
        array_join(
          filter(col("toks"), (_, i) => !array_contains(col("cut_idx"), (i / k).cast("int"))),
          " ").as("clean_text"),
        col("n_chunks"),
        size(col("cut_idx")).cast("long").as("n_dropped"))
  }
}
