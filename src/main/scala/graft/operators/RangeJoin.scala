package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — fact points joining dim intervals that
  * contain them — without the BroadcastNestedLoopJoin the naive
  * inequality predicate plans to.
  *
  * The standard bucketing rewrite: time is cut into fixed-width
  * buckets; a fact row lives in exactly ONE bucket, a dim interval is
  * exploded to every bucket it overlaps, and the join becomes an
  * EQUI-join on (partition, bucket) + an exact containment filter.
  * Because the fact side has one bucket, every qualifying (fact, dim)
  * pair meets in exactly one bucket — no dedup stage. Dim-side cost is
  * `interval_span / bucketWidth` replicas; pick the width near the
  * typical interval length so most intervals explode to ≤ 2 buckets.
  * All shuffles are keyed on (partition, bucket) — high cardinality,
  * and a hot partition key is subdivided by time, which is exactly the
  * skew story the naive formulation lacks.
  */
object RangeJoin {

  /** Inner range join on numeric (e.g. epoch-micros) columns: emits
    * fact ⨝ dim rows where `dim.startCol <= fact.tsCol <= dim.endCol`
    * within `partCols`. Column names across the two sides must be
    * disjoint apart from `partCols`. */
  def join(fact: DataFrame, dim: DataFrame, partCols: Seq[String],
      tsCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val fb = fact.withColumn("__bucket", floor(col(tsCol) / bucketWidth))
    val db = dim.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    fb.join(db, partCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
