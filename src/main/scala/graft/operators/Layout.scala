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

  /** Within-shard positions without a per-shard global window: the
    * naive formulation `row_number() OVER (PARTITION BY shard ORDER BY
    * key)` puts ONE TASK on each shard — a 16-shard layout of a 100 TB
    * corpus means 16 tasks sorting ~6 TB each. This is the [[Prefix]]
    * two-phase layout generalized to (shard, key):
    *
    *   1. range-repartition by (shard, key...) and pin the assignment —
    *      each partition holds a contiguous slice of one-or-more shards;
    *   2. one tiny job counts rows per (partition, shard); the driver
    *      folds counts into exclusive per-(partition, shard) offsets
    *      (≤ partitions + shards - 1 distinct pairs exist, since the
    *      range order groups each shard's slices contiguously);
    *   3. a per-(partition, shard) window — parallel, partition-local —
    *      adds the local row_number to the broadcast offset.
    *
    * `keyCols` must be unique per row within a shard (callers append a
    * unique id as tiebreak); `shardCol` must be a LongType column;
    * `outCol` is 1-based like row_number. */
  def shardPositions(df: DataFrame, shardCol: String, keyCols: Seq[String],
      outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val orderCols = (shardCol +: keyCols).map(col)
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("__pid"), col(shardCol).as("__shard"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val offsets = counts
      .groupBy(_._2)
      .toSeq
      .flatMap { case (shard, rows) =>
        val sorted = rows.sortBy(_._1)
        val exclusive = sorted.scanLeft(0L)(_ + _._3)
        sorted.map(_._1).zip(exclusive).map { case (pid, off) => (pid, shard, off) }
      }
    val offsetDf = spark.createDataFrame(offsets)
      .toDF("__opid", "__shard", "__off")
    val w = Window.partitionBy(col("__pid"), col(shardCol))
      .orderBy(keyCols.map(col): _*)
    ranged
      .join(broadcast(offsetDf),
        col("__pid") === col("__opid") && col(shardCol) === col("__shard"))
      .withColumn(outCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__opid", "__shard", "__off")
  }
}
