package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming shard writer — the continuous leg of
  * [[graft.operators.Layout.writeShards]]: laid-out documents append
  * into `shard=<k>/` parquet directories through Spark's partitioned
  * file sink, whose `_spark_metadata` commit log gives exactly-once
  * file visibility across restarts (a crashed micro-batch's files are
  * invisible to metadata-aware readers). A trainer or downstream job
  * reads one shard without touching the rest, exactly as with the
  * batch layout.
  *
  * The batch writer's in-file position sort has no streaming analog —
  * arrival order IS the order within each appended file — and the
  * manifest becomes a read-side aggregate ([[manifest]]) over the
  * committed files rather than a write-side artifact: in a stream
  * there is no "end" after which a final manifest could be written.
  */
object ShardWriterStream {

  /** Start appending `laidOut` (a streaming frame carrying `shardCol`)
    * into partitioned parquet under `outDir`. */
  def start(laidOut: DataFrame, shardCol: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    laidOut.writeStream
      .partitionBy(shardCol)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Per-shard row/token counts over the COMMITTED files (the sink's
    * metadata log filters out uncommitted writes). Same contract as the
    * batch manifest: partition-column inference narrows the shard
    * directory names to INT, so the shard column is cast back to
    * `shardType` — the laid-out frame's own type, as
    * `Layout.writeShards` does — so the manifest schema matches what
    * downstream consumers joined on. Defaults to LONG, the type every
    * layout operator here emits. */
  def manifest(spark: org.apache.spark.sql.SparkSession, outDir: String,
      shardCol: String, tokenCol: String,
      shardType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType): DataFrame =
    spark.read.parquet(outDir)
      .withColumn(shardCol, col(shardCol).cast(shardType))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(tokenCol)).as("n_tokens"))
}
