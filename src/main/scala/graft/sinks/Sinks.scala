package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink layer (SURVEY §2.9).
  *
  * K1 batched JDBC append (reference: 1000-row `bulk_save_objects`
  * slices, `diameter.py:458-467`) — Spark's JDBC writer batches
  * per-partition, so `batchsize` is the direct analog and the write
  * parallelizes across partitions instead of a single connection.
  * K2 (insert-returning-ids) is intentionally NOT reproduced: ids are
  * engine-assigned before the write (SURVEY §4.2), removing the
  * two-phase round-trip.
  */
object Sinks {

  /** K1: batched JDBC append. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 1000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** K7: DDL bootstrap statement from a Spark schema (the
    * `Base.metadata.create_all` analog, `diameter.py:608`). Default
    * flavor is PostgreSQL (the reference's engine); `dialect = "derby"`
    * maps the engine-specific pieces (no IF NOT EXISTS, VARCHAR/BLOB
    * instead of TEXT/BYTEA) so the statement runs on an embedded Derby
    * — which is how `JdbcSinkIntegrationSpec` executes this DDL against
    * a real database end-to-end. */
  def ddlFor(table: String, schema: StructType, dialect: String = "postgres"): String = {
    val derby = dialect == "derby"
    def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case BooleanType => "BOOLEAN"
      case TimestampType => "TIMESTAMP"
      case DoubleType => "DOUBLE PRECISION"
      case _: DecimalType => dt.asInstanceOf[DecimalType].sql
      case BinaryType => if (derby) "BLOB" else "BYTEA"
      case _ => if (derby) "VARCHAR(4000)" else "TEXT"
    }
    val cols = schema.fields
      .map(f => s"${f.name} ${sqlType(f.dataType)}${if (f.nullable) "" else " NOT NULL"}")
      .mkString(", ")
    val ifNotExists = if (derby) "" else "IF NOT EXISTS "
    s"CREATE TABLE $ifNotExists$table ($cols)"
  }

  /** K4: work-queue update statement (`diameter.py:625-629`) — executed
    * driver-side over plain JDBC after the job, with counters from the
    * observation below. */
  def queueUpdateSql(table: String, queueId: Long, processed: Long, notProcessed: Long): String =
    s"UPDATE $table SET processed = $processed, not_processed = $notProcessed, " +
      s"state = 2, updated_at = CURRENT_TIMESTAMP WHERE id = $queueId"

  /** A1: processed / not_processed counters as single-pass `observe()`
    * metrics — no second scan, no accumulator races (metrics are
    * task-retry-safe, unlike raw accumulators). */
  def withCounters(df: DataFrame, isError: Column): (DataFrame, Observation) = {
    val obs = Observation("graft_counters")
    val observed = df.observe(obs,
      sum(when(!isError, 1L).otherwise(0L)).as("processed"),
      sum(when(isError, 1L).otherwise(0L)).as("not_processed"))
    (observed, obs)
  }
}
