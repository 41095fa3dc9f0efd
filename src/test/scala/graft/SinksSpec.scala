package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

class SinksSpec extends AnyFunSuite {

  test("K7 ddl generation from a Spark schema") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frames_list", StringType),
      StructField("time_epoch", LongType),
      StructField("request", BooleanType)))
    assert(Sinks.ddlFor("diameter", schema) ==
      "CREATE TABLE IF NOT EXISTS diameter (id BIGINT NOT NULL, " +
        "frames_list TEXT, time_epoch BIGINT, request BOOLEAN)")
  }

  test("K4 queue update statement") {
    val sql = Sinks.queueUpdateSql("ingestion_queue", 7, 120, 3)
    assert(sql.contains("processed = 120") && sql.contains("not_processed = 3")
      && sql.contains("WHERE id = 7"))
  }

  test("A1 observe counters: single pass, exact counts") {
    val spark = SparkTest.spark
    import spark.implicits._
    val df = Seq(("a", false), ("b", true), ("c", false), ("d", false))
      .toDF("payload", "bad")
    val (observed, obs) = Sinks.withCounters(df, col("bad"))
    assert(observed.count() == 4)
    val m = obs.get
    assert(m("processed") == 3L && m("not_processed") == 1L)
  }
}
