package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for compute-dense operators.
  *
  * A parquet file is splittable only at row-group boundaries, so a
  * single-row-group file scans as ONE task no matter how many cores the
  * session has — and any compute-dense work pinned to that scan stage
  * (tokenize + explode, pairwise BNLJ scoring, per-row media decode)
  * runs single-threaded. That is the optimization guide's §2.5
  * "unsplittable input" case, and its prescription: repartition right
  * after the read.
  *
  * [[spread]] applies that prescription SCALE-ADAPTIVELY: only when the
  * frame is file-backed AND its file count is far below the session's
  * shuffle parallelism (the local bench's single-file tables; a gzip
  * drop; a badly compacted upstream). A real corpus — thousands of
  * files/row groups — already scans wide, so the guard is a no-op there
  * and no payload ever pays an extra shuffle at scale. Non-file frames
  * (spec fixtures, already-shuffled intermediates) are left untouched.
  *
  * The exchange is round-robin; Spark's sort-before-repartition
  * (SPARK-23207, on by default) keeps the row-to-partition assignment
  * reproducible under task retry, and every downstream consumer in this
  * engine is key-based aggregation/join work whose RESULT is
  * partitioning-independent by construction.
  */
object Par {

  /** `df`, repartitioned to the session's shuffle parallelism iff it is
    * a file-backed scan with too few splits to feed the cores. */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sessionState.conf.numShufflePartitions
    val files =
      try df.inputFiles.length
      catch { case scala.util.control.NonFatal(_) => 0 }
    if (files > 0 && files * 2 <= want) df.repartition(want) else df
  }

  /** Input-size ceiling (bytes) below which [[pin]] uses an EAGER
    * `localCheckpoint` for a multi-consumer frame. Above it the frame is
    * `persist(MEMORY_AND_DISK)`-ed instead: a localCheckpoint
    * materializes the WHOLE frame to executor-local storage up front,
    * is non-evictable, and is lost with an executor (non-reliable
    * checkpoint) — the right trade for a batch-scale intermediate, the
    * wrong one for a 100 TB joined corpus. Session-overridable so
    * deployments (and the gate's spec) can move the boundary. */
  val PinLocalCheckpointMaxBytesKey = "spark.graft.pin.localCheckpointMaxBytes"
  val PinLocalCheckpointMaxBytesDefault: Long = 8L << 30 // 8 GiB

  /** Pin a frame that several downstream subtrees will consume, so the
    * shared subtree executes ONCE (guide §5 reuse / §3.3 plan
    * truncation) — SIZE-GATED: below the byte ceiling (summed LEAF
    * sizes of the optimized plan — the only pre-execution estimate that
    * is not a join-cardinality guess), an eager `localCheckpoint`;
    * above it, `persist(MEMORY_AND_DISK)` — evictable, recoverable via
    * lineage, spills instead of pinning executor storage. Values are
    * identical either way: both materialize the same deterministic
    * rows. The persist leg's entry is dropped by the session's ordinary
    * cache management (the engine's bench clears caches between runs;
    * a serving deployment unpersists by ttl/eviction). */
  def pin(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val limit = conf.getOption(PinLocalCheckpointMaxBytesKey)
      .map(_.toLong).getOrElse(PinLocalCheckpointMaxBytesDefault)
    val leafBytes =
      try df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes).sum
      catch { case scala.util.control.NonFatal(_) => BigInt(0) }
    if (leafBytes <= limit) df.localCheckpoint(true)
    else {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }
  }
}
