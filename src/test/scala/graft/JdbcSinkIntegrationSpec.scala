package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

/** K1/K4/K7 against a REAL database — the embedded Derby that ships on
  * Spark's own classpath — end-to-end: DDL bootstrap executes, the
  * batched JDBC append writes through Spark's JDBC writer (batchsize
  * honored, 2500 rows > 2 flush cycles per partition) and reads back
  * row-identical, and the queue-update statement runs driver-side over
  * plain JDBC with counters taken from the single-pass observe()
  * metrics — the reference's post-job bookkeeping loop
  * (`diameter.py:458-467,625-629`) on a live connection instead of
  * unit-level SQL-string checks. */
class JdbcSinkIntegrationSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // keep derby.log out of the repo
  System.setProperty("derby.stream.error.file",
    java.nio.file.Files.createTempDirectory("derby").resolve("derby.log").toString)

  test("K7 DDL bootstrap + K1 batched append + read-back parity on live Derby") {
    val spark = SparkTest.spark
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = true),
      StructField("value", DoubleType, nullable = true)))
    withConn { c =>
      val st = c.createStatement()
      try st.executeUpdate("DROP TABLE events_sink") catch { case _: Exception => () }
      // the K7 statement itself, executed on a real engine
      st.executeUpdate(Sinks.ddlFor("events_sink", schema, dialect = "derby"))
      st.close()
    }
    val df = (1 to 2500).map(i =>
        (i.toLong, (i % 50).toLong, s"type_${i % 7}", i * 0.5))
      .toDF("event_id", "user_id", "event_type", "value")
      .repartition(4)
    val props = new java.util.Properties()
    Sinks.jdbcAppend(df, url, "events_sink", props, batchSize = 1000)
    val back = spark.read.jdbc(url, "events_sink", props)
    assert(back.count() === 2500)
    // row-identical, not just a count
    assert(back.orderBy("event_id").as[(Long, Long, String, Double)].collect().toSeq ===
      (1 to 2500).map(i => (i.toLong, (i % 50).toLong, s"type_${i % 7}", i * 0.5)))
    // appending again doubles — append mode, no silent truncate
    Sinks.jdbcAppend(df, url, "events_sink", props, batchSize = 1000)
    assert(spark.read.jdbc(url, "events_sink", props).count() === 5000)
  }

  test("K4 queue update with A1 observe counters, driver-side over live JDBC") {
    val spark = SparkTest.spark
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      try st.executeUpdate("DROP TABLE ingestion_queue") catch { case _: Exception => () }
      st.executeUpdate("CREATE TABLE ingestion_queue (id BIGINT, processed BIGINT, " +
        "not_processed BIGINT, state INTEGER, updated_at TIMESTAMP)")
      st.executeUpdate("INSERT INTO ingestion_queue VALUES (7, 0, 0, 1, NULL)")
      st.close()
    }
    // a pipeline run whose error rows are counted in the SAME pass
    val (observed, obs) = Sinks.withCounters(
      (1 to 100).map(i => (i.toLong, i % 10 == 0)).toDF("id", "is_err"),
      col("is_err"))
    observed.write.mode("overwrite").parquet(
      java.nio.file.Files.createTempDirectory("queue_out").toString + "/out")
    val row = obs.get
    val processed = row("processed").asInstanceOf[Long]
    val notProcessed = row("not_processed").asInstanceOf[Long]
    assert(processed === 90L && notProcessed === 10L)
    withConn { c =>
      val st = c.createStatement()
      st.executeUpdate(Sinks.queueUpdateSql("ingestion_queue", 7L, processed, notProcessed))
      st.close()
      val rs = c.createStatement().executeQuery(
        "SELECT processed, not_processed, state, updated_at FROM ingestion_queue WHERE id = 7")
      assert(rs.next())
      assert(rs.getLong(1) === 90L && rs.getLong(2) === 10L && rs.getInt(3) === 2)
      assert(rs.getTimestamp(4) != null)
      assert(!rs.next())
    }
  }
}
