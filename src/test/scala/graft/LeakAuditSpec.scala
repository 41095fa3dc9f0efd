package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Split-leakage audit + pair-derived leak-free split: planted pairs
  * straddling splits are flagged; the split derived from the same pair
  * relation audits clean; transitive families land in ONE split.
  */
class LeakAuditSpec extends AnyFunSuite {

  test("leakageAudit flags straddling pairs; pair-derived split audits clean") {
    val spark = SparkTest.spark
    import spark.implicits._
    val ids = (0L to 9L).toDF("doc_id")
    // pairs: 0~1, 1~2 (a chain), 5~6
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("da", "db")
    // a split that deliberately splits the chain
    val badSplit = ids.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, "train").otherwise("val").as("split"))
    val audit = Layout.leakageAudit(badSplit, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(4)).toMap
    assert(audit == Map((0L, 1L) -> true, (1L, 2L) -> true, (5L, 6L) -> true))

    val safe = Layout.leakFreeSplitFromPairs(ids, "doc_id", pairs)
    val safeAudit = Layout.leakageAudit(safe.select("doc_id", "split"), pairs)
      .collect().map(_.getBoolean(4))
    assert(safeAudit.length == 3 && safeAudit.forall(!_))
    // the whole 0-1-2 chain shares one cluster and one split
    val rows = safe.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(0L) == rows(1L) && rows(1L) == rows(2L))
    assert(rows(0L)._1 == 0L) // cluster = min member id
    // pair-less docs cluster alone
    assert(rows(7L)._1 == 7L)
  }
}
