package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: Reciprocal-Rank Fusion (RRF) of independently
  * ranked retrieval legs — the standard way to combine sparse lexical
  * (BM25, [[Bm25]]) and dense vector ([[Ann]]) results into one ranked
  * list (Cormack, Clarke & Büttcher, SIGIR 2009: "Reciprocal rank
  * fusion outperforms Condorcet and individual rank learning methods").
  * In a training-data pipeline this is the retrieval front end for
  * decontamination sweeps and hard-negative mining, where lexical and
  * semantic evidence each catch matches the other misses.
  *
  * Scale design: the legs do all the corpus-sized work and each already
  * has a served, partition-pruned deployment shape (term-bucketed BM25
  * index, IVF cell index). The fusion itself only ever touches
  * TOP-K-PER-QUERY rows — |queries|·k·legs rows, dimension-sized — so
  * it plans as a union + one hash aggregation + a per-qid window rank,
  * with no corpus-sized shuffle anywhere. Fusing more legs (phrase
  * matchers, metadata filters, multiple ANN probes) is O(k) per leg.
  *
  * Determinism contract: RRF's textbook score is Σ 1/(κ + rank) — a
  * rational whose float accumulation is order-dependent. The engine
  * keeps the entire fusion in BIGINT: each leg contributes
  * `RrfScale div (κ + rank)` (integer division), so the fused total is
  * an order-independent integer sum and a SQL oracle replays it
  * bit-for-bit. At `RrfScale` = 10⁹ the quotients for ranks 1..1000
  * are all distinct, so the integer ranking matches the real-valued
  * RRF ranking for any practical k.
  */
object Hybrid {

  /** κ in 1/(κ + rank): the SIGIR-2009 paper's k = 60. */
  val RrfKappa = 60L

  /** Fixed-point scale of one leg's contribution: floor(10⁹/(κ+rank)). */
  val RrfScale = 1000000000L

  /** Per-leg RRF contribution for a 1-based `rank` column: BIGINT
    * integral division (Catalyst `IntegralDivide`, SQL's `DIV`) — never
    * a float quotient whose rounding could drift across engines. */
  def rrfContribution(rank: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftBridge.column(IntegralDivide(
      GraftBridge.expression(lit(RrfScale)),
      GraftBridge.expression(lit(RrfKappa) + rank.cast("long")),
      evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
  }

  /** Fuse ranked legs into one top-`k` list per query. Every leg is a
    * (qid, doc_id, rank) frame with 1-based ranks (extra columns are
    * ignored); a document absent from a leg simply contributes nothing
    * for that leg. Returns (qid, doc_id, rrf, rank) ordered within each
    * query by (rrf desc, doc_id) — the deterministic tie-break every
    * ranked operator in the engine uses. */
  def rrfFuse(legs: Seq[DataFrame], k: Int): DataFrame = {
    require(legs.nonEmpty, "rrf fusion needs at least one ranked leg")
    val contribs = legs.map { leg =>
      leg.select(col("qid").cast("long").as("qid"),
        col("doc_id").cast("long").as("doc_id"),
        rrfContribution(col("rank")).as("c"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("rrf"))
    fused.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rrf"), col("rank"))
  }

  /** Drop the query's own document from a ranked leg and close the rank
    * gap: retrieval-for-augmentation wants neighbors, not the query
    * itself, and a leg that retrieved `kLeg+1` rows still yields `kLeg`
    * after the self row (at most one per query) is removed. Re-ranking
    * by (score desc, doc_id) — each leg's own order — keeps the result
    * identical to having excluded the self doc before ranking. */
  def dropSelf(leg: DataFrame, kLeg: Int): DataFrame =
    leg.filter(col("doc_id") =!= col("qid"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= kLeg)

  /** End-to-end hybrid top-k over a corpus carrying both text and an
    * embedding: BM25 leg over (`idCol`, `textCol`) + exact cosine leg
    * over (`idCol`, `vecCol`), self-excluded on both sides, RRF-fused.
    * `queries` carries one row per (qid, term) with the query's vector
    * repeated on each row (qid, term, qvec). `kLeg` is each leg's
    * retrieval depth; `k` the fused output depth.
    *
    * The cosine leg here is the exact broadcast scan
    * ([[Ann.bruteForceTopK]]) — the correctness baseline; at corpus
    * scales where Q·N is unpayable swap in [[Ann.ivfTopKAssigned]] /
    * the served IVF index (v11's deployment shape) — the fusion is
    * agnostic to how a leg was ranked. */
  def hybridTopK(corpus0: DataFrame, idCol: String, textCol: String, vecCol: String,
      queries0: DataFrame, kLeg: Int, k: Int): DataFrame = {
    // user-facing TVF over arbitrary parquet: null ids/text/vectors
    // carry nothing to retrieve (the Phrases.tag convention). Null
    // modality inputs are filtered PER LEG, not conjunctively: the
    // legs are independent by design (RRF fuses legs of different
    // coverage), so a qid whose term rows are all null — e.g. query
    // terms drawn by element_at past a short doc's token count — still
    // retrieves on its vector leg, and a null-qvec qid on its lexical
    // leg. A row-level AND would silently drop such qids from BOTH.
    // ONE materialization of the (possibly join-derived) corpus feeds
    // both legs: without the pin each leg's every consumer re-executes
    // the corpus subtree (t48's documents ⋈ embeddings join ran 5×),
    // and [[Par.spread]] keeps the legs' corpus-sized compute off a
    // single-split scan stage (guide §2.5/§3.3). Values unchanged —
    // the pin materializes the same deterministic rows. SIZE-GATED
    // ([[Par.pin]], round 18): an eager localCheckpoint below the byte
    // ceiling, persist(MEMORY_AND_DISK) above it — a 100 TB joined
    // corpus must not be force-materialized to non-evictable
    // executor-local storage (the round-17 verdict's scale flag).
    val corpus = Par.pin(Par.spread(corpus0.filter(col(idCol).isNotNull &&
      col(textCol).isNotNull && col(vecCol).isNotNull)))
    val queries = queries0.filter(col("qid").isNotNull)
    val lexLeg = dropSelf(
      Bm25.batchTopK(corpus, idCol, textCol,
        queries.filter(col("term").isNotNull)
          .select(col("qid"), col("term")), kLeg + 1),
      kLeg)
    val qVecs = queries.filter(col("qvec").isNotNull)
      .select(col("qid").cast("long").as("qid"), col("qvec"))
      .groupBy(col("qid")).agg(first(col("qvec")).as("qvec"))
    val vecLeg = Ann.bruteForceTopK(
        corpus.select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec")),
        qVecs, kLeg)
      .select(col("qid"), col("cid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lexLeg.select(col("qid"), col("doc_id"), col("rank")), vecLeg), k)
  }

  /** Hybrid top-k served ENTIRELY from the standing committed indexes —
    * the corpus-scale deployment shape [[hybridTopK]]'s scaladoc points
    * at, packaged: the lexical leg reads only the query terms' buckets
    * of a [[Bm25.buildIndex]] index (manifest-selected paths, serve ==
    * batch bit-identically), the vector leg probes only `nprobe` cells
    * of a committed [[Ann.ivfIndexBuild]] index, and the BIGINT RRF
    * fusion touches top-kLeg-per-query rows only. Neither leg re-scans
    * a corpus, so the cost per query batch is the probed index slices —
    * this is what a retrieval front end runs per arriving batch while
    * [[graft.streaming.IndexMaintain]] grows both indexes underneath.
    *
    * Each leg pins ONE manifest for its whole serve (the CURRENT-read
    * discipline of [[Bm25.serveTopK]] / [[Ann.ivfServedTopK]]); a
    * maintenance tick committing midway is invisible. The two legs may
    * pin DIFFERENT commit points of their respective indexes — they are
    * independent indexes, and RRF fuses legs of different coverage by
    * construction.
    *
    * With `nprobe` >= the index's cell count the vector leg is the
    * exact scan, and this equals [[hybridTopK]] over the indexed corpus
    * row-for-row (the parity spec's configuration); production sets
    * nprobe to the recall target. `queries` carries (qid, term, qvec)
    * rows — the [[hybridTopK]] contract. */
  def servedTopK(spark: SparkSession, bm25Dir: String, ivfDir: String,
      queries0: DataFrame, kLeg: Int, k: Int, nprobe: Int): DataFrame =
    servedTopKVersioned(spark, bm25Dir, ivfDir, queries0, kLeg, k, nprobe)
      .results

  /** One hybrid serve's results plus the committed index versions the
    * two legs actually pinned — what an epoch output must be tagged
    * with to be REPLAYABLE ([[servedTopKVersion]] re-serves exactly
    * this answer after any number of later ticks, as long as the
    * vacuum grace window keeps the versions). */
  final case class ServedHybrid(results: DataFrame, bm25Version: Long,
      ivfVersion: Long)

  /** [[servedTopK]], also reporting which committed version of each
    * index the serve pinned (ONE manifest read per leg — the reported
    * version IS the served one, never a racy second read). */
  def servedTopKVersioned(spark: SparkSession, bm25Dir: String,
      ivfDir: String, queries0: DataFrame, kLeg: Int, k: Int,
      nprobe: Int): ServedHybrid = {
    val mB = Bm25.readManifest(spark, bm25Dir)
    val mV = Ann.readIvfManifest(spark, ivfDir)
    ServedHybrid(
      servedTopKAt(spark, bm25Dir, mB, ivfDir, mV, queries0, kLeg, k, nprobe),
      mB.version, mV.version)
  }

  /** TIME-TRAVEL hybrid serve: both legs AS OF explicit committed
    * versions — the replay read for a tagged
    * [[graft.streaming.HybridStream.serveSink]] epoch
    * ([[ManifestIO.readVersion]] servability rules on both dirs). */
  def servedTopKVersion(spark: SparkSession, bm25Dir: String,
      bm25Version: Long, ivfDir: String, ivfVersion: Long,
      queries0: DataFrame, kLeg: Int, k: Int, nprobe: Int): DataFrame =
    servedTopKAt(spark, bm25Dir,
      Bm25.readManifestVersion(spark, bm25Dir, bm25Version),
      ivfDir, Ann.readIvfManifestVersion(spark, ivfDir, ivfVersion),
      queries0, kLeg, k, nprobe)

  private def servedTopKAt(spark: SparkSession, bm25Dir: String,
      mB: Bm25.IndexManifest, ivfDir: String, mV: Ann.IvfManifest,
      queries0: DataFrame, kLeg: Int, k: Int, nprobe: Int): DataFrame = {
    // pin ONE materialization of the query frame — and only one: both
    // legs must fuse the SAME query set even for a non-deterministic
    // caller frame, and every frame both legs derive from this pin is
    // deterministic, so the lexical leg enters through
    // [[Bm25.serveTopKPinnedAt]] (no second internal checkpoint — the
    // redundant pin cost one materialization per serve, and
    // [[graft.streaming.HybridStream.serveStream]] paid it per
    // micro-batch). Null modality inputs filter PER LEG off the pin
    // (the [[hybridTopK]] rule): a qid with all-null terms still
    // serves on its vector leg, a null-qvec qid on its lexical leg.
    val queries = queries0.filter(col("qid").isNotNull).localCheckpoint(true)
    val lexLeg = dropSelf(
      Bm25.serveTopKPinnedAt(spark, bm25Dir,
        queries.filter(col("term").isNotNull)
          .select(col("qid"), col("term")), kLeg + 1, mB),
      kLeg)
    val qVecs = queries.filter(col("qvec").isNotNull)
      .select(col("qid").cast("long").as("qid"), col("qvec"))
      .groupBy(col("qid")).agg(first(col("qvec")).as("qvec"))
    // the vector leg excludes self pairs (qid != cid), like the brute leg
    val vecLeg = Ann.ivfServedTopKFrom(spark, ivfDir, mV, qVecs, kLeg, nprobe)
      .select(col("qid"), col("cid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lexLeg.select(col("qid"), col("doc_id"), col("rank")), vecLeg), k)
  }
}
