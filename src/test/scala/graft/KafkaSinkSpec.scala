package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.KafkaSink

/** K6 — the Kafka write path, exercised as far as this sandbox allows:
  * the serialization path (canonical key/value/topic frame, JSON line
  * protocol) and the producer path (foreachBatch → foreachPartition →
  * ProducerRecord-shaped sends) run END-TO-END through a collector
  * shim; the `format("kafka")` leg is driven up to Spark's provider
  * lookup, whose failure message pins exactly which public artifact
  * revives it (no connector jar ships in this offline sandbox). */
object KafkaSinkSpec {
  // executor-side collector: local-mode executors share the JVM, so a
  // static queue observes exactly what a broker would have received
  val sent = new ConcurrentLinkedQueue[(String, String, String)]()
  object CollectingProducer extends KafkaSink.RowProducer {
    def send(topic: String, key: String, value: String): Unit =
      sent.add((topic, key, value))
  }
}

class KafkaSinkSpec extends AnyFunSuite {

  test("toKafkaFrame: canonical schema, JSON value round-trips, keyless and keyed") {
    val spark = SparkTest.spark
    import spark.implicits._
    val df = Seq((1L, "alice", 2.5), (2L, null.asInstanceOf[String], 0.0))
      .toDF("event_id", "user", "value")
    val keyless = KafkaSink.toKafkaFrame(df, "events")
    assert(keyless.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("key", "string"), ("value", "string"), ("topic", "string")))
    val rows = keyless.orderBy(get_json_object(col("value"), "$.event_id"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
    assert(rows.forall(_.getString(2) == "events"))
    // JSON line protocol: all columns present, nulls dropped (reference
    // parser.py emits compact JSON lines the same way)
    assert(rows(0).getString(1) === """{"event_id":1,"user":"alice","value":2.5}""")
    assert(rows(1).getString(1) === """{"event_id":2,"value":0.0}""")
    val keyed = KafkaSink.toKafkaFrame(df, "events", Seq("event_id", "user")).collect()
    assert(keyed.map(_.getString(0)).toSet === Set("1:alice", "2"))
  }

  test("producer path: streaming foreachBatch sends exactly the frame's rows") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    KafkaSinkSpec.sent.clear()
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_shim_ckpt").toString
    val q = KafkaSink.writeStreamVia(
      input.toDS().toDF("id", "msg").withColumn("upper", upper(col("msg"))),
      "t1", ckpt, KafkaSinkSpec.CollectingProducer, keyCols = Seq("id"))
    try {
      input.addData((1L, "a"), (2L, "b"))
      assert(StreamSync.drain(q) { KafkaSinkSpec.sent.size == 2 })
      input.addData((3L, "c"))
      assert(StreamSync.drain(q) { KafkaSinkSpec.sent.size == 3 })
    } finally q.stop()
    val msgs = KafkaSinkSpec.sent.toArray(Array.empty[(String, String, String)]).sortBy(_._2)
    assert(msgs.map(_._1).forall(_ == "t1"))
    assert(msgs.map(_._2).toSeq === Seq("1", "2", "3"))
    assert(msgs(0)._3 === """{"id":1,"msg":"a","upper":"A"}""")
  }

  test("producer path: batch variant sends every partition's rows") {
    val spark = SparkTest.spark
    import spark.implicits._
    KafkaSinkSpec.sent.clear()
    val df = (1 to 100).map(i => (i.toLong, s"m$i")).toDF("id", "msg").repartition(8)
    KafkaSink.writeBatchVia(df, "bulk", KafkaSinkSpec.CollectingProducer)
    val msgs = KafkaSinkSpec.sent.toArray(Array.empty[(String, String, String)])
    assert(msgs.length === 100)
    assert(msgs.forall(m => m._1 == "bulk" && m._2 == null))
    assert(msgs.map(_._3).toSet.contains("""{"id":42,"msg":"m42"}"""))
  }

  test("format(\"kafka\") wiring reaches the provider lookup (jar absent here)") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_real_ckpt").toString
    val thrown = intercept[Exception] {
      val q = KafkaSink.writeStream(input.toDS().toDF("id", "msg"),
        "localhost:9092", "t", ckpt)
      try { input.addData((1L, "x")); q.processAllAvailable() } finally q.stop()
    }
    val msg = Option(thrown.getMessage).getOrElse("") + (thrown match {
      case e: StreamingQueryException => Option(e.getCause).map(_.getMessage).getOrElse("")
      case _ => ""
    })
    // Spark names the missing public artifact in its error — the exact
    // one-jar change that makes this same call write to a real broker
    assert(msg.toLowerCase.contains("kafka"))
  }
}
