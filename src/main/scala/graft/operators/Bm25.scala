package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Sparse lexical retrieval: inverted postings + BM25 top-k — the
  * classic complement to the embedding-based ANN family (v1-v10), and
  * the retrieval half of a decontamination / data-curation pipeline
  * (find the training documents that best match an eval query).
  *
  * Scale design:
  *   - The postings build filters to the QUERY terms inside the scan
  *     task (explode → isin → partial-aggregated count): only rows for
  *     queried terms ever shuffle, so a 3-term query over a 100 TB
  *     corpus shuffles a few GB of (doc, term, tf) rows, not the
  *     corpus. A standing-index deployment would persist the full
  *     postings list partitioned by term; the query-time plan is the
  *     same join with the scan replaced by an index read.
  *   - Document frequency and the corpus length stats are tiny
  *     (|terms| rows and 1 row) and ride broadcasts into the scoring
  *     projection — scoring itself is one narrow pass over the matched
  *     postings.
  *   - Top-k plans as TakeOrderedAndProject: per-partition heaps, no
  *     global sort.
  *
  * Determinism contract (the engine's cross-engine hash-match bar):
  * the textbook BM25 idf is `ln((N-df+0.5)/(df+0.5)+1)` — a
  * transcendental whose last-ulp behavior is libm-dependent, so the
  * engine uses the RATIONAL idf `(N-df+0.5)/(df+0.5)` (same sign and
  * ordering for df ≤ N, which a postings-derived df always satisfies).
  * The tf-saturation term is untouched. All arithmetic is spelled in
  * the exact same order on the Spark and oracle sides; per-term scores
  * are combined by FIXED-ORDER addition over conditional aggregates,
  * never a float `sum()` whose accumulation order is engine-defined.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75
  // k1 + 1 and the b-complement, written as literals so both engines
  // parse the identical double rather than folding 1.2 + 1 themselves
  val K1Plus1 = 2.2
  val OneMinusB = 0.25

  /** Per-(doc, term) tf postings for `terms` only. */
  def postings(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k: one output row per retrieved doc with per-term partial
    * scores (fixed column per query term) and their fixed-order total,
    * ordered by (score desc, doc_id), limited to `topK`. Duplicate
    * query terms are collapsed; per-term columns are referenced
    * backquoted so terms containing dots (e.g. a domain) stay plain
    * column names rather than nested-field paths. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms0: Seq[String], topK: Int): DataFrame = {
    val terms = terms0.distinct
    require(terms.nonEmpty, "bm25 needs at least one query term")
    def scol(t: String): Column = col(s"`s_$t`")
    val dl = docs.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .select(col("n"), (col("sdl").cast("double") / col("n")).as("avgdl"))
    val tf = postings(docs, idCol, textCol, terms)
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))

    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val dlr = col("dl").cast("double") / col("avgdl")
    val score = (idf * (col("tf") * lit(K1Plus1))) /
      (col("tf") + lit(K1) * (lit(OneMinusB) + lit(B) * dlr))

    val scored = tf
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(dfreq), "t")
      .select(col("doc_id"), col("t"), score.as("s"))

    val partials: Seq[Column] = terms.map(t =>
      sum(when(col("t") === t, col("s"))).as(s"s_$t"))
    val total = terms.map(t => coalesce(scol(t), lit(0.0))).reduceLeft(_ + _)
    scored.groupBy(col("doc_id"))
      .agg(partials.head, partials.tail: _*)
      .select(col("doc_id") +: terms.map(t => coalesce(scol(t), lit(0.0)).as(s"s_$t")) :+
        total.as("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
