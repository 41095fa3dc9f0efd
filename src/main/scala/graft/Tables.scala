package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through here so
  * that scan-level concerns (schema, pushdown verification, future
  * bucketing) have a single home.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Schema-adaptive timestamp load. The driver has shipped `events.ts` under
    * two physical encodings across testdata generations:
    *   - INT64 TIMESTAMP(NANOS), which Spark 4 refuses to read natively — we
    *     load it as raw nanos (legacy conf) and truncate to micros, exactly
    *     what DuckDB does on the same file so oracle comparisons agree;
    *   - plain `timestamp[us]`, which loads as TIMESTAMP/TIMESTAMP_NTZ and
    *     needs no arithmetic.
    * Branch on the *loaded* type so either generation of the data reads
    * identically (a hard-coded nanos path broke 15 queries in round 8 when
    * the data was regenerated — VERDICT r8 §wrong#1). */
  private def withNanosTs(spark: SparkSession, sfDir: String, name: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema(tsCol).dataType match {
      case LongType =>
        // integer division: ns epoch overflows double's 2^53 mantissa
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        // session tz is UTC everywhere we run, so NTZ→TIMESTAMP is lossless
        // and keeps downstream arithmetic + oracle parity on one type
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = withNanosTs(spark, d, "events", "ts")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
