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
}
