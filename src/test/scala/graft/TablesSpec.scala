package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-adaptive `events.ts` load (round-8 regression class).
  *
  * The driver has shipped `events.parquet` with `ts` as INT64
  * TIMESTAMP(NANOS) (loads as LongType under the legacy conf) and as plain
  * `timestamp[us]` (loads as TIMESTAMP/TIMESTAMP_NTZ). `Tables.events` must
  * read BOTH generations to identical TIMESTAMP values — a loader pinned to
  * one physical encoding silently zeroed 15 oracle queries in round 8 when
  * the testdata was regenerated.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = SparkTest.spark
  import spark.implicits._

  // 2021-03-04T05:06:07.123456Z as epoch micros
  private val micros = 1614834367123456L

  private def loadFrom(write: String => Unit): (org.apache.spark.sql.types.DataType, Seq[Timestamp]) = {
    val dir = Files.createTempDirectory("graft-tables").toFile
    dir.deleteOnExit()
    write(s"$dir/events.parquet")
    val df = Tables.events(spark, dir.toString)
    val rows = df.select("ts").sort("ts").collect().map(_.getTimestamp(0)).toSeq
    (df.schema("ts").dataType, rows)
  }

  test("nanos-as-long generation: INT64 ts is truncated to micros and typed TIMESTAMP") {
    val (tpe, rows) = loadFrom { path =>
      // a plain BIGINT column loads as LongType — same loaded shape as the
      // old TIMESTAMP(NANOS) data under spark.sql.legacy.parquet.nanosAsLong
      Seq(micros * 1000L + 789L, micros * 1000L) // sub-micro noise truncated
        .toDF("ts").withColumn("user_id", lit(1L))
        .write.mode("overwrite").parquet(path)
    }
    assert(tpe == org.apache.spark.sql.types.TimestampType)
    assert(rows == Seq(new Timestamp(micros / 1000), new Timestamp(micros / 1000)).map { t =>
      t.setNanos(((micros % 1000000) * 1000).toInt); t
    })
  }

  test("timestamp[us] generation: ts passes through with identical values") {
    val want = new Timestamp(micros / 1000)
    want.setNanos(((micros % 1000000) * 1000).toInt)
    val (tpe, rows) = loadFrom { path =>
      Seq(want).toDF("ts").withColumn("user_id", lit(1L))
        .write.mode("overwrite").parquet(path)
    }
    assert(tpe == org.apache.spark.sql.types.TimestampType)
    assert(rows == Seq(want))
  }

  test("the shipped testdata loads with a timestamp-typed ts at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"$sf: ts loaded as ${df.schema("ts").dataType}")
      assert(df.limit(1).count() == 1, s"$sf: events empty")
    }
  }
}
