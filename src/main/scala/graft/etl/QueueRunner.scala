package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Work-queue orchestration analog (`models.py:250-263`, `diameter.sh`):
  * the reference scales out by N single-file worker processes pulling
  * rows from `ingestion_queue`; here the queue row is produced per
  * capture file and the per-file pipeline run IS the work unit. On a
  * cluster the files process concurrently inside one Spark job (the v2
  * source gives one partition per file); this runner exists for
  * drop-in operational parity — per-file bookkeeping, state
  * transitions, counters — and for driving the JDBC queue table (K4).
  */
object QueueRunner {

  /** Mirror of the reference's queue row (`models.py:250-263`). */
  final case class QueueEntry(
      id: Long,
      filename: String,
      processed: Long,
      notProcessed: Long,
      state: Int, // 0=pending, 1=processing, 2=done, 3=failed
      owner: String,
      pid: Long,
      ingestionInstanceId: Long,
      createdAt: Timestamp,
      processedAt: Timestamp)

  /** Process every capture file under `dirGlob` with `pipeline`
    * (file → records DataFrame), returning one queue row per file.
    * Failures are quarantined per file (state=3), matching the
    * reference's row-level error model (§4.1). */
  def run(spark: SparkSession, dirGlob: String, instanceId: Long,
      pipeline: (SparkSession, String) => DataFrame): Seq[QueueEntry] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dirGlob.takeWhile(_ != '*')), spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(new org.apache.hadoop.fs.Path(dirGlob)))
      .map(_.toSeq).getOrElse(Seq.empty).filter(_.isFile).map(_.getPath.toString)
    val pid = ProcessHandle.current().pid()
    files.zipWithIndex.map { case (file, i) =>
      val created = new Timestamp(System.currentTimeMillis())
      try {
        val n = pipeline(spark, file).count()
        QueueEntry(i + 1L, file, n, 0L, state = 2, owner = "graft", pid = pid,
          ingestionInstanceId = instanceId, createdAt = created,
          processedAt = new Timestamp(System.currentTimeMillis()))
      } catch {
        case _: Exception =>
          QueueEntry(i + 1L, file, 0L, 0L, state = 3, owner = "graft", pid = pid,
            ingestionInstanceId = instanceId, createdAt = created,
            processedAt = new Timestamp(System.currentTimeMillis()))
      }
    }
  }
}
