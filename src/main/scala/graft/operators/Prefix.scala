package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum — the global running total Spark's own
  * window can't do at scale: `sum(x) OVER (ORDER BY k)` with no
  * PARTITION BY plans to ONE task holding the whole corpus. The classic
  * two-phase layout instead:
  *
  *   1. range-repartition by the order column and pin the assignment
  *      (`localCheckpoint`) so every later pass sees identical
  *      partitions — partition i holds a contiguous key range, all
  *      ranges in partition order;
  *   2. one tiny job reduces each partition to its sum; the driver
  *      folds those into EXCLUSIVE per-partition offsets (numPartitions
  *      rows — the only data that ever leaves the executors);
  *   3. a per-partition window (PARTITION BY partition id — parallel,
  *      no global sort) adds the local running sum to the broadcast
  *      offset.
  *
  * Two passes over the data and a numPartitions-row collect, vs. the
  * single-task global window. On a real cluster swap `localCheckpoint`
  * for reliable checkpointing (same caveat as [[Components]]).
  */
object Prefix {

  /** Adds `outCol` = inclusive running total of `valueCol` in
    * `orderCol` order. `orderCol` values must be unique — with
    * duplicate keys the range boundary between two equal keys is
    * partitioner-dependent and "running total" is ill-defined. */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame =
    runningTotal(df, Seq(orderCol), valueCol, outCol, numPartitions)

  /** Composite-key variant: running total in lexicographic
    * (`orderCols`) order; the COMBINATION must be unique per row
    * (callers append a unique id as tiebreak, as in
    * [[Layout.groupRunningTotals]]). */
  def runningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String, numPartitions: Int): DataFrame =
    runningTotalAndSum(df, orderCols, valueCol, outCol, numPartitions)._1

  /** [[runningTotal]] plus the GRAND total, which the driver fold has
    * already computed — callers needing N (e.g. [[Quality.pplBuckets]]'s
    * tier boundary) read it here instead of re-aggregating the frame
    * with another distributed job. */
  def runningTotalAndSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String, numPartitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partSums = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = partSums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }
    val exclusive = partSums.map(_._1).zip(offsets.map(_._2)).toMap
    val offsetDf = spark.createDataFrame(
      exclusive.toSeq.map { case (pid, off) => (pid, off) })
      .toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged.join(broadcast(offsetDf), "__pid")
      .withColumn(outCol, sum(col(valueCol)).over(w) + col("__off"))
      .drop("__pid", "__off")
    (out, partSums.map(_._2).sum)
  }
}
