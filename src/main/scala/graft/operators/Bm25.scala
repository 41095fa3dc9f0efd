package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Stopword-prune rule shared by every batch path: a term present in
    * ≥ 80 % of documents carries near-zero idf and a corpus-sized
    * postings row-count — the single biggest skew key in a term-
    * partitioned shuffle. `5*df >= 4*n` (integer arithmetic, engine-
    * identical) drops it from scoring, the same pruning a Lucene
    * stop-filter applies at index time. */
  val PruneDfNum = 4
  val PruneDfDen = 5

  /** Partition count of the standing index — bucket = pmod(xxhash64(t), 16). */
  val IndexBuckets = 16

  /** Fixed-point scale of the batch/served/streaming per-term score:
    * floor(score·10⁶) as BIGINT. The t19/t37 discipline, and the reason
    * is SCALE as much as parity — an integer per-(query, doc) total
    * sums order-independently, so it plans as a codegen'd partial-
    * aggregated HashAggregate with map-side combine, where the
    * fixed-order double fold needed an ObjectHashAggregate buffering
    * every term row per group (collect_list + sort_array; measured
    * 4.6 s → ~2 s on the t40 corpus). 10⁻⁶ resolution leaves the BM25
    * ranking semantically untouched; floor (not round) because IEEE
    * half-even vs half-up diverges across engines. */
  val ScoreScale = 1000000L

  /** Per-query-term score, spelled once so the batch, served and
    * streaming paths compute bit-identical doubles (operation order
    * fixed; every literal written as a single double constant), then
    * floored into the [[ScoreScale]] fixed-point domain. */
  private def termScoreFp(tf: Column, df: Column, n: Column, dl: Column,
      avgdl: Column): Column =
    floor((((n - df + lit(0.5)) / (df + lit(0.5))) * (tf * lit(K1Plus1)) /
      (tf + lit(K1) * (lit(OneMinusB) + lit(B) * (dl.cast("double") / avgdl))))
      * lit(1000000.0)).cast("long")

  private def rankTopK(totals: DataFrame, k: Int): DataFrame =
    totals.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)

  /** Batch multi-query BM25 top-k: `queries` is a (qid, term) frame —
    * one row per query term; duplicate terms within a query are
    * collapsed. Returns (qid, doc_id, score, rank) with rank ≤ `k` per
    * query, ranked by (score desc, doc_id).
    *
    * Scale shape: the query batch is dimension-sized and rides a
    * broadcast into the postings build, so only rows for queried terms
    * ever shuffle; df/stats are broadcast; the per-(qid, doc) fold is
    * one hash aggregation; ranking partitions by qid (no global sort).
    * ≥ 80 %-df terms are pruned (see [[PruneDfNum]]) — both the
    * standard stopword rule and the defense against the one term that
    * would otherwise put a corpus-sized posting list in a single
    * shuffle partition. */
  def batchTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("qid").cast("long").as("qid"),
      col("term").as("t")).distinct()
    val dl = docs.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .select(col("n"), (col("sdl").cast("double") / col("n")).as("avgdl"))
    val terms = q.select(col("t")).distinct()
    // dl rides the postings rows (constant per doc, one extra long per
    // shuffled row) so scoring never joins two corpus-sized frames —
    // the serve path gets the same for free from the denormalized index
    val tf = docs.select(col(idCol).cast("long").as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("t"))
      .join(broadcast(terms), "t")
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val kept = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats.select(col("n"))))
      .filter(col("df") * PruneDfDen < col("n") * PruneDfNum)
      .select(col("t"), col("df"))
    val scored = tf
      .join(broadcast(kept), "t")
      .crossJoin(broadcast(stats))
      .join(broadcast(q), "t")
      .select(col("qid"), col("doc_id"),
        termScoreFp(col("tf"), col("df"), col("n"), col("dl"), col("avgdl")).as("s"))
    rankTopK(scored.groupBy(col("qid"), col("doc_id")).agg(sum(col("s")).as("score")), k)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
  }

  /** Build the standing inverted index at `dir`: FULL postings — one
    * row per (term, doc) with tf, the doc's length and the term's df
    * denormalized onto the row (the Lucene norms/term-dictionary data,
    * flattened) — written `partitionBy(bucket)` where
    * bucket = pmod(xxhash64(t), [[IndexBuckets]]), plus a 1-row
    * `stats` table (n docs, total token count). Serving reads ONLY the
    * buckets of the query's terms: the scan's PartitionFilters prune
    * the rest of the corpus unread, the same layout discipline as the
    * IVF cell index (Ann.ivfServedIndex). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String, dir: String): Unit = {
    val dl = docs.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val tf = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "t").join(dl, "doc_id")
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(IndexBuckets)).cast("int"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/postings")
    dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** How many distinct terms a serve batch may carry: terms are
    * collected to plan the bucket pruning and broadcast back — past
    * this bound the batch is corpus-shaped and belongs on
    * [[batchTopK]]'s distributed path. Fails loudly, never OOMs. */
  val MaxServeTerms = 100000

  /** Serve a query batch from a persisted [[buildIndex]] index.
    * Matches [[batchTopK]] bit-exactly on the same corpus: same
    * pruning, same score arithmetic, same fold order. The postings
    * scan carries TWO pushed predicates — `bucket isin (...)` becomes
    * a PartitionFilter (whole directories skipped) and `t isin (...)`
    * a parquet row-group filter inside the surviving buckets. */
  def serveTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("qid").cast("long").as("qid"),
      col("term").as("t")).distinct()
    val termRows = q.select(col("t")).distinct()
      .limit(MaxServeTerms + 1).collect().map(_.getString(0))
    require(termRows.length <= MaxServeTerms,
      s"bm25 serve: query batch exceeds $MaxServeTerms distinct terms — " +
        "bucket planning collects the term set to the driver; batch the " +
        "queries or run batchTopK against the corpus directly")
    // bucket ids via Spark's own xxhash64 (a driver-side reimplementation
    // could drift from the function that laid the partitions out)
    val bucketIds = {
      import spark.implicits._
      termRows.toIndexedSeq.toDF("t")
        .select(pmod(xxhash64(col("t")), lit(IndexBuckets)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0))
    }
    val stats0 = spark.read.parquet(s"$indexDir/stats")
    val stats = stats0.select(col("n"),
      (col("sdl").cast("double") / col("n")).as("avgdl"))
    val post = spark.read.parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(bucketIds.toIndexedSeq.map(_.asInstanceOf[Any]): _*) &&
        col("t").isin(termRows.toIndexedSeq.map(_.asInstanceOf[Any]): _*))
    val kept = post
      .crossJoin(broadcast(stats.select(col("n"))))
      .filter(col("df") * PruneDfDen < col("n") * PruneDfNum)
      .drop("n")
    val scored = kept
      .crossJoin(broadcast(stats))
      .join(broadcast(q), "t")
      .select(col("qid"), col("doc_id"),
        termScoreFp(col("tf"), col("df"), col("n"), col("dl"), col("avgdl")).as("s"))
    rankTopK(scored.groupBy(col("qid"), col("doc_id")).agg(sum(col("s")).as("score")), k)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
  }

  /** APPEND tick of the standing-index lifecycle ([[buildIndex]]
    * builds, [[serveTopK]] serves, this grows). The subtlety this
    * operator exists for: the index denormalizes each term's df onto
    * its postings rows (the Lucene term-dictionary flattening that
    * lets serving scan one frame), so appending documents STALES the
    * df of every term they contain — blind row appends would serve
    * wrong scores, not just miss documents.
    *
    * The fix exploits the layout: a term lives in exactly ONE bucket
    * (bucket = hash(term)), so only the buckets of the batch's terms
    * are affected. The tick reads those buckets, unions the batch's
    * postings rows in, recomputes df per term inside the union
    * (df = postings rows per term — self-contained), and rewrites ONLY
    * those bucket partitions (dynamic partition overwrite; untouched
    * buckets are never read or written). The 1-row stats table is
    * recomputed from its old values + the batch's (n, Σdl) — no corpus
    * re-scan anywhere: the tick costs the batch scan + the affected
    * buckets' rewrite. With [[IndexBuckets]] buckets a text batch
    * usually touches all of them — at corpus scale the bucket count is
    * sized so each bucket is a manageable rewrite unit, and a skewed
    * small batch (one domain, one language) touches fewer.
    *
    * Serving afterwards is bit-identical to an index built over the
    * union corpus in one shot: avgdl shifts globally, but serve-time
    * scoring reads avgdl from stats, never from postings rows. */
  def appendToIndex(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val newDl = newDocs.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val newTf = newDocs.select(col(idCol).cast("long").as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(IndexBuckets)).cast("int"))
    val touched = newTf.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)) // ≤ IndexBuckets values
    val existing = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(touched.toIndexedSeq.map(_.asInstanceOf[Any]): _*))
      .select(col("t"), col("doc_id"), col("tf"), col("dl"), col("bucket"))
    val unioned = existing
      .unionByName(newTf.select(col("t"), col("doc_id"), col("tf"), col("dl"), col("bucket")))
    val winDf = org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
    // df recompute rides the same bucket-partitioned shuffle; pinned
    // before the write because the plan still reads the dir it rewrites
    val rewritten = unioned
      .withColumn("df", count(lit(1)).over(winDf))
      .select(col("t"), col("doc_id"), col("tf"), col("df"), col("dl"), col("bucket"))
      .localCheckpoint()
    rewritten.write.partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$dir/postings")
    val old = spark.read.parquet(s"$dir/stats")
      .select(col("n"), col("sdl")).head()
    val batch = newDl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .select(col("n"), col("sdl")).head()
    val statsDf = {
      import spark.implicits._
      Seq((old.getLong(0) + batch.getLong(0), old.getLong(1) + batch.getLong(1)))
        .toDF("n", "sdl")
    }
    statsDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }
}
