package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic operator Spark lacks as a
  * primitive: each fact row picks up the LATEST dim row of its
  * partition with `dim.ts <= fact.ts`.
  *
  * Composed from existing operators per the preference order (no custom
  * SparkPlan needed): both sides union into one keyed stream with a
  * side tag, and a single `last(value, ignoreNulls)` window ordered by
  * (ts, side) carries every dim value forward to the fact rows that
  * follow it. Dim-before-fact on equal timestamps gives the standard
  * inclusive (`<=`) semantics. ONE shuffle on the partition key, one
  * sort — the same cost as any windowed computation over the fact
  * stream; a sort-merge-join formulation would shuffle both sides AND
  * build the inequality pairing per row. Hot partition keys concentrate
  * a window partition (same accepted trade as the file-keyed windows);
  * salt the key upstream if one entity dominates.
  */
object AsOf {

  /** Left as-of join: `fact` keeps all rows, gaining `dimValCols` from
    * the latest `dim` row at-or-before its `tsCol` within `partCols`
    * (null when no dim row precedes). `dimValCols` must not collide
    * with fact columns; dim rows must be unique per (partCols, tsCol)
    * — pre-aggregate otherwise, or the pick among same-instant dim rows
    * is arbitrary. */
  def joinLeft(fact: DataFrame, dim: DataFrame, partCols: Seq[String],
      tsCol: String, dimValCols: Seq[String]): DataFrame = {
    val factCols = fact.columns.toSeq
    require(dimValCols.intersect(factCols).isEmpty,
      s"dim value columns ${dimValCols.intersect(factCols)} collide with fact columns")
    val dimPrep = dim
      .select((partCols :+ tsCol).map(col) ++ dimValCols.map(col): _*)
      .withColumn("__side", lit(0))
    val factPrep = fact.withColumn("__side", lit(1))
    val unioned = factPrep.unionByName(dimPrep, allowMissingColumns = true)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = dimValCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((factCols ++ dimValCols).map(col): _*)
  }
}
