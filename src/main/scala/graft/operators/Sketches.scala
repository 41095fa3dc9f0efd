package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Frequency / cardinality sketches over the token stream — the
  * streaming-systems workhorses (Cormode–Muthukrishnan Count-Min,
  * Flajolet HyperLogLog) built DETERMINISTICALLY: every hash is
  * md5-derived (the engine's cross-engine discipline), so unlike
  * library sketches with private seeds, the full sketch state — and
  * therefore the estimates — are pure functions of the corpus that a
  * SQL oracle replays bit-exactly.
  *
  * Scale rationale: both sketches are one partial-aggregated groupBy
  * whose result state is CONSTANT-size (d·w counters / m registers)
  * regardless of corpus size, and both are mergeable by construction
  * (counter addition / register max) — the shapes that survive a
  * 1000-executor tree aggregation when exact per-term counts or exact
  * distinct counts would not.
  */
object Sketches {

  /** 60-bit md5-derived hash of a salted string column — the
    * `Layout.md5Bucket` parity pattern (proven vs DuckDB
    * `CAST('0x'||substring(md5(..),1,15) AS BIGINT)`). */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** CMS cell of `term` in sketch row `row`: md5("cms<row>#<term>") mod width. */
  def cmsCell(term: Column, row: Int, width: Int): Column =
    md5Long(concat(lit(s"cms$row#"), term)) % width

  /** Occurrence-level CMS counter grid (row, cell, cnt) — each token
    * occurrence increments one cell per sketch row. Works identically
    * on a batch or STREAMING frame: the streaming deployment is this
    * exact groupBy under complete/update mode, counters merging by
    * addition across micro-batches. */
  // NOTE (r18 A/B): Par.spread of this kernel's tokenize REGRESSED
  // t43 0.64→0.88 s (5-run medians, same window) — single-consumer
  // tokenize below ~0.3 s single-task does not pay for the exchange
  // (the r17 BigramLm rule). Only the TWO-consumer tokenize in
  // [[hllRegistersByGroup]] keeps the spread (t47 0.86→0.67 s).
  def cmsGrid(docs: DataFrame, textCol: String, depth: Int, width: Int): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("t"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsCell(col("t"), r, width).as("cell"))): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Occupied HLL register rows (bucket, register) — max-merged, so the
    * same groupBy accumulates across micro-batches on a streaming
    * frame. Buckets no token has hit are absent (fill with 0 at
    * read-out, as [[hllRegisters]] does). */
  def hllRegisterRows(docs: DataFrame, textCol: String): DataFrame = {
    val h = docs.select(explode(tokens(col(textCol))).as("t")) // unspread: see cmsGrid note
      .select(md5Long(concat(lit("hll#"), col("t"))).as("w"))
    h.select((col("w") % 16).as("bucket"),
        when(shiftright(col("w"), 4) === 0, lit(57))
          .otherwise(lit(57) - length(bin(shiftright(col("w"), 4)))).cast("long").as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
  }

  /** Count-Min estimates for every distinct term, with the true count
    * alongside: the d×w counter grid is built from the exact term
    * counts (one narrow pass + one tiny groupBy — the grid is d·w
    * integers however large the corpus), and each term's estimate is
    * the min over its d counters. `overestimate = estimate − true ≥ 0`
    * is the CMS guarantee made visible — collisions only ever inflate. */
  def cmsEstimates(docs: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    val termCounts = docs.select(explode(tokens(col(textCol))).as("t")) // unspread: see cmsGrid note
      .groupBy(col("t")).agg(count(lit(1)).as("true_count"))
    val cells = termCounts.select(
      col("t"), col("true_count"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsCell(col("t"), r, width).as("cell"))): _*)).as("rc"))
      .select(col("t"), col("true_count"), col("rc.r").as("r"), col("rc.cell").as("cell"))
    val grid = cells.groupBy(col("r"), col("cell"))
      .agg(sum(col("true_count")).as("cnt"))
    cells.join(broadcast(grid), Seq("r", "cell"))
      .groupBy(col("t"), col("true_count"))
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col("t").as("term"), col("true_count"), col("cms_estimate"),
        (col("cms_estimate") - col("true_count")).as("overestimate"))
  }

  /** HyperLogLog registers + raw estimate over the distinct tokens of
    * the corpus, with the exact distinct count alongside. One md5 hash
    * per token: low 4 bits pick the register (m = 16), ρ = leading-zero
    * rank of the remaining 56-bit field (via `bin()` string length —
    * identical in both engines; no transcendentals: 2^−M is computed as
    * `1.0 / (1L << M)`, exact in IEEE, and the harmonic sum folds in
    * register order). Raw Flajolet estimate α₁₆·m²/Σ2^−Mⱼ without the
    * small/large-range corrections (they need `ln`; documented
    * deviation — the REGISTERS are the mergeable sketch state, and
    * corrections are a driver-side cosmetic on top of them). */
  /** Per-group HLL: distinct-token estimate for every value of
    * `groupCol` (vocabulary diversity per crawl source / language — a
    * standing curation metric), with the same md5 hash and ρ rule as
    * the global sketch. State is ≤ m = 16 registers PER GROUP whatever
    * the corpus size, merged by max — the per-key shape that survives a
    * tree aggregation at any group cardinality (no groups×buckets fill
    * join: absent buckets contribute 2⁰ = 1 each to the harmonic sum,
    * folded in as the single closed-form correction `m − present`).
    * Emits one row per OCCUPIED (group, bucket) with the group's
    * estimate and exact distinct count alongside. */
  def hllRegistersByGroup(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // the tokenize feeds TWO consumers (registers + exact distinct) off
    // one reused exchange; unspread it ran twice in a 1-task scan stage
    // (r18 profile: the 0.5 s single-task job dominating t47)
    val tok = Par.spread(docs.select(col(groupCol).as("grp"), col(textCol).as("_t")))
      .select(col("grp"), explode(tokens(col("_t"))).as("t"))
    val reg = tok.select(col("grp"), md5Long(concat(lit("hll#"), col("t"))).as("w"))
      .select(col("grp"), (col("w") % 16).as("bucket"),
        when(shiftright(col("w"), 4) === 0, lit(57))
          .otherwise(lit(57) - length(bin(shiftright(col("w"), 4)))).cast("long").as("rho"))
      .groupBy(col("grp"), col("bucket")).agg(max(col("rho")).as("register"))
    val den = reg.groupBy(col("grp"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("bucket"),
            (lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), CAST(register AS INT))")).as("inv")))),
          lit(0.0), (a, x) => a + x.getField("inv")).as("s0"),
        count(lit(1)).as("present"))
      .select(col("grp"),
        (lit(0.673) * lit(256.0) / (col("s0") + (lit(16) - col("present")))).as("hll_estimate"))
    val td = tok.groupBy(col("grp")).agg(count_distinct(col("t")).as("true_distinct"))
    reg.join(den, Seq("grp")).join(td, Seq("grp"))
      .select(col("grp").as(groupCol), col("bucket"), col("register"),
        col("hll_estimate"), col("true_distinct"))
  }

  def hllRegisters(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val reg = hllRegisterRows(docs, textCol)
    val allBuckets = spark.range(0, 16).select(col("id").as("bucket"))
    val full = allBuckets.join(reg, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("register"), lit(0L)).as("register"))
    // 2^−M as 1.0/(1L<<M): exact in IEEE (register ≤ 57), no pow/ln;
    // the harmonic sum folds in register order on both engines
    val den = full
      .withColumn("inv",
        lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), CAST(register AS INT))"))
      .agg(aggregate(sort_array(collect_list(struct(col("bucket"), col("inv")))),
        lit(0.0), (a, x) => a + x.getField("inv")).as("s"))
      .select((lit(0.673) * lit(256.0) / col("s")).as("hll_estimate"))
    val td = docs.select(explode(tokens(col(textCol))).as("t")) // unspread: see cmsGrid note
      .agg(count_distinct(col("t")).as("true_distinct"))
    full.crossJoin(broadcast(den)).crossJoin(broadcast(td))
      .select(col("bucket"), col("register"), col("hll_estimate"), col("true_distinct"))
  }
}
