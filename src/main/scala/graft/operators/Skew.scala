package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is pathological
  * (one subscriber, one capture file, one template document carrying a
  * large fraction of the rows).
  *
  * AQE's skew-join handles the sort-merge case at runtime and should
  * stay on in production; explicit salting remains the tool when AQE
  * cannot help — aggregation state keyed by the hot key, streaming
  * stateful operators, or a join the planner cannot split (e.g. the
  * build side is already aggregated). The salted join here keeps
  * results IDENTICAL to the plain join: the fact side gets a
  * deterministic per-row salt, the dimension side is replicated once
  * per salt bucket, and the join key becomes (key, salt) — the hot
  * key's rows now land on `buckets` reducers instead of one.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): xxHash64 over the whole
    * row. Unlike `rand()` or `monotonically_increasing_id()` it is
    * stable under task retries and re-partitioning (a must: a retried
    * task re-salting rows differently would double- or zero-count them),
    * and it spreads a hot KEY because the non-key columns vary across
    * its rows. Fully identical rows share a salt by construction, which
    * costs nothing: map-side partial aggregation combines them before
    * the shuffle anyway. */
  def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets.toLong)).cast("int")

  /** Skew-safe equi-join: `fact` rows are salted, `dim` rows are
    * replicated `buckets` times (once per salt value), and the join runs
    * on `keys :+ salt`. The result equals `fact.join(dim, keys,
    * joinType)` row-for-row; the dim-side cost is `buckets ×` its size
    * through the shuffle — the standard trade for splitting a hot key
    * across `buckets` reducers.
    *
    * Only fact-preserving join types are allowed: under replication an
    * unmatched dim row would surface `buckets` times in a right/full
    * join, so those are rejected. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    val salted = fact.withColumn("__salt", rowSalt(fact, buckets))
    // shuffle-hash, not broadcast and not sort-merge: a caller reaching
    // for saltedJoin has already decided the dim does NOT broadcast
    // (otherwise there is no shuffle to skew), and the exchange on
    // (keys, salt) spreading the hot key across reducers IS the point —
    // without the hint the planner may broadcast the replicated dim
    // (paying a buckets× driver build for nothing) or sort both sides
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))).hint("shuffle_hash")
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
