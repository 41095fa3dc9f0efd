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

  /** `events.ts` is INT64 TIMESTAMP(NANOS) in parquet, which Spark 4 refuses
    * to read as a timestamp. Read it as raw nanos (legacy conf) and truncate
    * to microsecond precision — exactly what DuckDB does when it loads the
    * same file, so oracle comparisons see identical values. */
  private def withNanosTs(spark: SparkSession, sfDir: String, name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // integer division: ns epoch overflows double's 2^53 mantissa
    df.withColumn(tsCol, org.apache.spark.sql.functions.expr(s"timestamp_micros($tsCol div 1000)"))
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
