package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact prefix sum — the global running total Spark's own
  * window can't do at scale: `sum(x) OVER (ORDER BY k)` with no
  * PARTITION BY plans to ONE task holding the whole corpus. The classic
  * two-phase layout instead:
  *
  *   1. range-repartition by the order column and pin the assignment
  *      (`localCheckpoint`) so every later pass sees identical
  *      partitions — partition i holds a contiguous key range, all
  *      ranges in partition order;
  *   2. one NARROW job (`mapPartitions` over the pinned partitions — no
  *      exchange) reduces each partition to its sum; the driver folds
  *      those into EXCLUSIVE per-partition offsets (numPartitions rows —
  *      the only data that ever leaves the executors);
  *   3. a partition-local sort + one typed `mapPartitions` pass adds the
  *      local running sum to the broadcast offset — ZERO shuffle. The
  *      rows already sit in the right partition by construction, so the
  *      `PARTITION BY __pid` window this replaces was re-exchanging the
  *      whole frame just to tell the planner what phase 1 had already
  *      done; at 100 TB that exchange is the dominant cost of the whole
  *      operator. The typed pass pays a Row codec per row instead — CPU
  *      bounded, no network/disk — the right trade everywhere.
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
    val partSums = partGroupSums(ranged, None, valueCol)
      .map { case ((pid, _), s) => pid -> s }
      .sortBy(_._1)
    val offsets = partSums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }
    val exclusive: Map[(Int, Any), Long] =
      partSums.map(_._1).zip(offsets.map(_._2))
        .map { case (pid, off) => ((pid, null: Any), off) }.toMap
    val out = addRunningTotal(ranged, orderCols, valueCol, outCol, None, exclusive)
      .drop("__pid")
    (out, partSums.map(_._2).sum)
  }

  /** Phase 2: per-(partition, group) sums of `valueCol`, computed with a
    * narrow `mapPartitions` over the pinned frame — no aggregation
    * exchange; the result (≤ partitions + groups rows for a range-
    * ordered frame) is the only data collected to the driver. `grpCol`
    * None folds the whole partition under group key null. Null values
    * count as zero (matching `sum`'s null handling). */
  private[operators] def partGroupSums(ranged: DataFrame, grpCol: Option[String],
      valueCol: String): Array[((Int, Any), Long)] = {
    val cols = Seq(col("__pid")) ++ grpCol.map(col) ++ Seq(col(valueCol).cast("long"))
    val hasGrp = grpCol.isDefined
    val vIdx = if (hasGrp) 2 else 1
    ranged.select(cols: _*).rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[(Int, Any), Long]
      it.foreach { r =>
        val k = (r.getInt(0), if (hasGrp) r.get(1) else (null: Any))
        val v = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
        m.update(k, m.getOrElse(k, 0L) + v)
      }
      m.iterator
    }.collect()
  }

  /** Phase 3: partition-local sort, then one typed pass appending
    * `outCol` = broadcast offset of the row's (partition, group) + the
    * running local sum. The group key resets the accumulator (rows
    * arrive grouped because `orderCols` leads with the group column);
    * `grpIdx` None treats the whole partition as one group. No shuffle:
    * the frame is already partitioned the way phases 1-2 pinned it. */
  private[operators] def addRunningTotal(ranged: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String, grpIdx: Option[Int],
      offsets: Map[(Int, Any), Long]): DataFrame = {
    val spark = ranged.sparkSession
    val schema = ranged.schema
    val pidIdx = schema.fieldIndex("__pid")
    val valIdx = schema.fieldIndex(valueCol)
    val bc = spark.sparkContext.broadcast(offsets)
    implicit val enc: Encoder[Row] = Encoders.row(schema.add(outCol, LongType, nullable = false))
    ranged.sortWithinPartitions(orderCols.map(col): _*)
      .mapPartitions { it =>
        val off = bc.value
        var acc = 0L
        var started = false
        var curGrp: Any = null
        it.map { r =>
          val grp: Any = grpIdx.map(r.get).orNull
          if (!started || (grpIdx.isDefined && !java.util.Objects.equals(curGrp, grp))) {
            acc = off.getOrElse((r.getInt(pidIdx), grp), 0L)
            curGrp = grp
            started = true
          }
          if (!r.isNullAt(valIdx)) acc += r.getAs[Number](valIdx).longValue()
          Row.fromSeq(r.toSeq :+ acc)
        }
      }
  }
}
