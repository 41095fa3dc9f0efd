package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set layout operators: leakage-free splits and deterministic
  * shard assignment — the last mile between a deduplicated corpus and
  * the files a trainer reads.
  */
object Layout {

  /** Stable 60-bit md5 bucket of a column rendered as a string — the
    * same construction as the t12 hash-sample key, whose cross-engine
    * parity (Spark `conv(substring(md5(..)))` vs DuckDB
    * `CAST('0x'||substring(md5(..)) AS BIGINT)`) is already proven. */
  def md5Bucket(c: Column, buckets: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long") % buckets

  /** Cluster-aware train/val/test split: every document in one near-dup
    * cluster lands in the SAME split, so near-duplicates of a validation
    * document can never leak into train. The split decision hashes the
    * CLUSTER id, not the doc id — the whole point — via a stable md5
    * bucket (reproducible across runs, engines, partitionings).
    *
    * Composes [[Components.dupClusters]]: the signature-graph component
    * pass is corpus-size-independent (≤ 2^sigBits nodes) and docs pick
    * up cluster + split through broadcast probes; no doc-sized shuffle
    * beyond the signature pass itself. Returns (doc_id, cluster,
    * split). */
  def leakFreeSplit(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = md5Bucket(col("cluster"), 100)
    Components.dupClusters(docs, idCol, textCol, maxDist)
      .select(col("doc_id"), col("cluster"),
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }

  /** [[leakFreeSplit]] from an EXPLICIT near-dup pair relation — any
    * kernel's verdicts (minhash t6, embedding v20, media m14) instead
    * of the built-in simhash clustering: components close the pairs
    * (bounded driver union-find, distributed past the edge bound), the
    * cluster id takes the md5 bucket, pair-less ids cluster alone.
    * This is the form a pipeline that already ran its dedup kernel
    * uses — the split is then leak-free BY CONSTRUCTION with respect
    * to exactly that kernel's relation, which is the property
    * [[leakageAudit]] checks. */
  def leakFreeSplitFromPairs(ids: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10,
      maxDriverEdges: Int = Components.MaxDriverEdges): DataFrame = {
    val comp = Components.componentsAuto(pairs, "da", "db", maxDriverEdges)
      .withColumnRenamed("node", "id")
    val withCluster = ids.select(col(idCol).cast("long").as("id"))
      .filter(col("id").isNotNull)
      .join(broadcast(comp), Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("component"), col("id")).as("cluster"))
    val bucket = md5Bucket(col("cluster"), 100)
    withCluster.select(col(idCol), col("cluster"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Split-leakage AUDIT — the validation counterpart of the split
    * builders: given a split assignment and a near-dup PAIR relation,
    * emit one row per pair with both sides' splits and a `violation`
    * flag (the pair straddles two splits — a near-duplicate of an eval
    * document reachable from train). Run it before training on ANY
    * split you didn't derive from the same pair relation; a
    * [[leakFreeSplitFromPairs]] split audits to zero violations by
    * construction. Scale: the pair frame is near-dup-family-sized and
    * broadcasts into two streaming joins against the corpus-sized
    * split assignment — the corpus never shuffles. */
  def leakageAudit(splits: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", splitCol: String = "split"): DataFrame =
    pairs.select(col("da").cast("long").as("da"), col("db").cast("long").as("db"))
      .join(splits.select(col(idCol).cast("long").as("da"),
        col(splitCol).as("split_a")), "da")
      .join(splits.select(col(idCol).cast("long").as("db"),
        col(splitCol).as("split_b")), "db")
      .select(col("da"), col("db"), col("split_a"), col("split_b"),
        (col("split_a") =!= col("split_b")).as("violation"))

  /** Per-group running totals without a one-task-per-group window: the
    * naive `sum(v) OVER (PARTITION BY g ORDER BY key)` puts each
    * group's ENTIRE row set in one task — a 16-shard layout of a 100 TB
    * corpus means 16 tasks sorting ~6 TB each. This is the [[Prefix]]
    * two-phase layout generalized to (group, key):
    *
    *   1. range-repartition by (group, key...) and pin the assignment —
    *      each partition holds a contiguous slice of one-or-more groups;
    *   2. one NARROW job sums `valueCol` per (partition, group) — no
    *      aggregation exchange ([[Prefix.partGroupSums]]); the driver
    *      folds the sums into exclusive per-(partition, group) offsets
    *      (≤ partitions + groups - 1 distinct pairs exist, since the
    *      range order keeps each group's slices contiguous);
    *   3. a partition-local sort + typed pass adds the local running
    *      sum to the broadcast offset ([[Prefix.addRunningTotal]]) —
    *      zero shuffle; the `PARTITION BY (__pid, group)` window this
    *      replaces re-exchanged the whole frame to re-create the
    *      partitioning phase 1 had already pinned.
    *
    * `keyCols` must be unique per row within a group (callers append a
    * unique id as tiebreak); `valueCol` must be an integral, non-null
    * column (the driver fold reads Long sums); `outCol` is the
    * INCLUSIVE running total of `valueCol` in key order within the
    * group. Group keys may be any orderable type (the offset frame
    * reuses the input column's DataType; NULL groups are matched
    * null-safely). */
  def groupRunningTotals(df: DataFrame, groupCol: String, keyCols: Seq[String],
      valueCol: String, outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(df.schema(valueCol).dataType)
    }, s"groupRunningTotals needs an integral valueCol, got ${df.schema(valueCol).dataType}")
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val orderCols = (groupCol +: keyCols).map(col)
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val sums = Prefix.partGroupSums(ranged, Some(groupCol), valueCol)
    val offsets: Map[(Int, Any), Long] = sums
      .groupBy(_._1._2)
      .iterator
      .flatMap { case (grp, rows) =>
        val sorted = rows.sortBy(_._1._1)
        val exclusive = sorted.scanLeft(0L)(_ + _._2)
        sorted.map(_._1._1).zip(exclusive).map { case (pid, off) =>
          ((pid, grp), off)
        }
      }
      .toMap
    val grpIdx = ranged.schema.fieldIndex(groupCol)
    Prefix.addRunningTotal(ranged, groupCol +: keyCols, valueCol, outCol,
      Some(grpIdx), offsets)
      .drop("__pid")
  }

  /** Within-shard positions (1-based, like row_number): the
    * [[groupRunningTotals]] layout with a constant-1 value column.
    * `shardCol` must be a LongType column. */
  def shardPositions(df: DataFrame, shardCol: String, keyCols: Seq[String],
      outCol: String, numPartitions: Int = 0): DataFrame =
    groupRunningTotals(df.withColumn("__one", lit(1L)), shardCol, keyCols,
      "__one", outCol, numPartitions)
      .drop("__one")

  /** Write a laid-out corpus as trainer-ready shard files plus a
    * manifest: one parquet directory per shard (`shard=<k>/`, Spark's
    * partitioned layout, so a trainer or a downstream job reads one
    * shard without touching the rest), rows within each shard files
    * sorted by position, and a `_manifest` parquet recording per-shard
    * row and token counts — the index a data loader consults before
    * opening anything.
    *
    * Scale notes: `repartition(shardCol)` gives one write task per
    * shard (shards are sized for training files, so one task per shard
    * is the intended granularity — at 100 TB you pick n_shards
    * accordingly); `sortWithinPartitions` orders rows inside each file
    * without a global sort; the manifest is a shard-count-sized
    * aggregate. */
  def writeShards(laidOut: DataFrame, shardCol: String, posCol: String,
      tokenCol: String, outDir: String): Unit = {
    // sort by (shard, pos): the writer itself requires ordering by the
    // partition columns, and a [pos]-only sort would be discarded by
    // the SortExec Spark inserts for [shard] whenever a task holds more
    // than one shard
    laidOut
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write
      .partitionBy(shardCol)
      .mode("overwrite")
      .parquet(outDir)
    // manifest from the files just written: re-aggregating `laidOut`
    // would re-run its whole lineage (offset join + window) a second
    // time; the read-back is a two-column scan and doubles as a
    // write-path check. Partition-column type inference narrows the
    // shard directory names to INT — cast back to the laid-out frame's
    // type so the manifest schema matches what downstream consumers
    // joined on.
    laidOut.sparkSession.read.parquet(outDir)
      .withColumn(shardCol, col(shardCol).cast(laidOut.schema(shardCol).dataType))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(tokenCol)).as("n_tokens"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(outDir + "/_manifest")
  }

  /** Temperature-balanced source sampling (the multilingual-corpus
    * rebalance: sample sources proportional to c^α, α = 0.5, so small
    * sources are boosted and huge ones damped) with a deterministic
    * hash keep-decision per document.
    *
    * Determinism contract: the α-weights are INTEGERIZED —
    * `floor(sqrt(c))` per source — so the weight normalizer is an exact
    * BIGINT sum (a float Σ√c would be order-of-accumulation dependent
    * and break cross-engine parity; sqrt itself is IEEE
    * correctly-rounded in both engines). Each source's keep rate is
    * one double division of two products whose FACTORS are cast to
    * double first — at the documented 10¹²-doc scale the BIGINT
    * products w·t and z·c can exceed Long.MaxValue, which Spark
    * (non-ANSI) wraps silently while DuckDB errors: a silent parity
    * break. Each factor is exactly representable (< 2⁵³) and IEEE
    * double multiply/divide round identically on both engines, so the
    * double-first form is deterministic AND overflow-free. A document
    * is kept iff its 60-bit md5 value < rate · 2⁶⁰.
    *
    * Plan shape: two tiny aggregates (per-source counts, corpus
    * normalizer) broadcast into one narrow filter pass — no doc-sized
    * shuffle at all before the caller's ordering. Target size is the
    * fraction `targetNum/targetDen` of the corpus (in expectation;
    * hash sampling gives binomial deviations). */
  def temperatureSample(docs: DataFrame, idCol: String, sourceCol: String,
      targetNum: Int, targetDen: Int): DataFrame = {
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("w", floor(sqrt(col("c"))).cast("long"))
    val stats = counts.agg(sum(col("c")).as("n"), sum(col("w")).as("z"))
    val t = expr(s"(n * $targetNum) div $targetDen")
    val rate = least(lit(1.0),
      (col("w").cast("double") * t.cast("double")) /
        (col("z").cast("double") * col("c").cast("double")))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    docs.select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source"))
      .join(broadcast(counts), "source")
      .crossJoin(broadcast(stats))
      .filter(bucket.cast("double") < rate * lit(1152921504606846976.0)) // 2^60
      .select(col("doc_id"), col("source"))
  }

  /** Token-budget source mixing: keep each source's documents — in a
    * stable hash order, so the selection is reproducible and unbiased
    * by corpus layout — until the source's INCLUSIVE running token
    * count exceeds the budget. The standard "balance the mixture"
    * curation step (cap over-represented sources); the running count
    * uses [[groupRunningTotals]], never a per-source global window.
    * Returns (doc_id, source, n_tokens, cum_tokens) for kept docs. */
  /** Mixture-rate PLANNER — the step between "we want these source
    * proportions" and the operators that execute them ([[sourceMix]]
    * caps, [[epochUpsample]] repeats, [[temperatureSample]] rebalances):
    * given integer-percent target weights and a total token budget,
    * compute per source what it must contribute and the per-mille
    * sampling rate a hash gate applies. Everything is integer
    * arithmetic (floor division), so the plan is engine- and
    * partitioning-independent and SQL-replayable.
    *
    * Per source: `n_tokens` (what exists), `target_tokens` =
    * budget·pct DIV 100 (what the mixture wants; unlisted sources get
    * `defaultPct`), `rate_permille` = min(1000,
    * target·1000 DIV n_tokens) — the downsampling gate — and
    * `deficit` = max(0, target − n_tokens): a source that cannot fill
    * its slice even at rate 1000 needs [[epochUpsample]]'s repeats (the
    * >100%-epoch regime) or a target rebalance; the planner REPORTS
    * the shortfall rather than silently redistributing it. One narrow
    * scan + one per-source aggregation; the stats frame is
    * source-cardinality-sized. */
  def mixtureRates(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targets: Map[String, Int], defaultPct: Int,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    // user-facing TVF convention: null source/text rows carry nothing
    // to plan for
    val stats = docs
      .filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    // BIGINT integral division (Catalyst IntegralDivide): budget·pct
    // can pass 2^53, where a double floor silently loses integers
    def ldiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide}
      GraftBridge.column(IntegralDivide(
        GraftBridge.expression(a.cast("long")),
        GraftBridge.expression(b.cast("long")), EvalMode.LEGACY))
    }
    val pct = targets.foldLeft(lit(defaultPct)) { case (acc, (src, p)) =>
      when(col("source") === src, p).otherwise(acc)
    }
    val target = ldiv(lit(tokenBudget) * pct.cast("long"), lit(100L))
    stats.select(col("source"), col("n_docs"), col("n_tokens"),
        target.as("target_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("target_tokens"),
        // n_tokens = 0 guard: DIV-by-zero yields NULL and least() SKIPS
        // nulls, which would silently report rate 1000 (full admission)
        // for a source that can contribute nothing — report rate 0 and
        // let the deficit column carry the full shortfall instead
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(least(lit(1000L),
            ldiv(col("target_tokens") * lit(1000L), col("n_tokens"))))
          .as("rate_permille"),
        greatest(lit(0L), col("target_tokens") - col("n_tokens")).as("deficit"))
  }

  def sourceMix(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, tokenBudget: Long): DataFrame = {
    val tok = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(sourceCol).as("source"),
      size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"),
      md5(col(idCol).cast("string")).as("k"))
    mixFromCounts(tok, tokenBudget)
  }

  /** [[sourceMix]] with TOKENIZER-accurate counts: a document costs
    * what the trainer will actually pay for it — its symbol count
    * under a trained BPE merge list ([[graft.operators.Bpe.encode]]
    * semantics) — instead of whitespace tokens. The merge list is
    * driver data shipped in the closure (broadcast-model shape); the
    * layout is the identical two-phase grouped running total. */
  def sourceMixBpe(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, tokenBudget: Long,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksBc = spark.sparkContext.broadcast(graft.operators.Bpe.rankTable(merges))
    val tok = docs
      .select(col(idCol).cast("long"), col(sourceCol), col(textCol))
      .as[(Long, String, String)]
      .map { case (id, source, text) =>
        var n = 0L
        graft.operators.Dedup.wsTokens(text).foreach(w =>
          n += graft.operators.Bpe.countSymbols(w, ranksBc.value))
        (id, source, n)
      }
      .toDF("doc_id", "source", "n_tokens")
      .withColumn("k", md5(col("doc_id").cast("string")))
    mixFromCounts(tok, tokenBudget)
  }

  private def mixFromCounts(tok: DataFrame, tokenBudget: Long): DataFrame =
    groupRunningTotals(tok, "source", Seq("k", "doc_id"), "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))

  /** Epoch-based source re-weighting — the data-budget mix step of a
    * training run (the Llama-style "Wikipedia 2.45 epochs, CommonCrawl
    * 0.64 epochs" table): each document is emitted `floor(e)` times
    * plus one more with probability `frac(e)`, where `e` is its
    * source's epoch weight. Weights are integer PERCENT (245 = 2.45
    * epochs; < 100 down-samples; 0 excludes the source) so the
    * arithmetic is exact on both engines. The fractional copy is gated
    * by a salted [[md5Bucket]] of the doc id — deterministic across
    * runs, partitionings and engines, and independent of the t12
    * sample gate (different salt).
    *
    * Emits (doc_id, source, copy_no) REFERENCES, not copied text — at
    * 100 TB the whole pass is a narrow map-side explode with no
    * shuffle, and the trainer's shard writer materialises bytes once
    * per copy downstream. A missing source takes `defaultPct`. */
  def epochUpsample(docs: DataFrame, idCol: String, sourceCol: String,
      pctBySource: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((pctBySource.values ++ Seq(defaultPct)).forall(_ >= 0), "epoch pcts must be >= 0")
    val pct = coalesce(
      element_at(typedLit(pctBySource), col(sourceCol)),
      lit(defaultPct)).cast("long")
    val gate = conv(
      substring(md5(concat(lit("ep:"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long") % 100
    val nCopies = (floor(pct / 100) + when(gate < pct % 100, 1).otherwise(0)).cast("long")
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source"),
        nCopies.as("n_copies"))
      .select(col("doc_id"), col("source"),
        explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))).as("copy_no"))
  }
}
