package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** K6 — the reference's (dormant) Kafka→Druid leg re-expressed
  * Spark-first: `diameter.sh:43-45,52` pipes parser output as one JSON
  * line per record into `kafka-console-producer` (keyless, topic from
  * the CLI). Structured Streaming's Kafka sink wants exactly a
  * (key, value, topic) frame, so the component splits cleanly:
  *
  *   - [[toKafkaFrame]] — the SERIALIZATION path: any DataFrame →
  *     canonical (key STRING, value STRING, topic STRING), value =
  *     `to_json(struct(*))` (the reference's line protocol), key
  *     NULL when keyless (console-producer parity) or a `:`-joined
  *     column tuple for partition affinity. Pure Spark SQL —
  *     executable and spec-pinned with no connector on the classpath.
  *   - [[writeStreamVia]] — a connector-free producer path:
  *     `foreachBatch` + `foreachPartition` driving any
  *     [[KafkaSink.RowProducer]] (the `ProducerRecord(topic, key,
  *     value)` shape). This is the leg the sandbox CAN execute
  *     end-to-end; swapping the shim for a real
  *     `org.apache.kafka.clients.producer.KafkaProducer` is a
  *     one-class change at the deployment boundary.
  *   - [[writeStream]] — the real `format("kafka")` wiring, live when
  *     `spark-sql-kafka-0-10` is on the classpath (it is public Maven
  *     Central; this sandbox has no egress, so the spec pins the
  *     provider-lookup failure message instead of a broker round-trip).
  *
  * Delivery semantics: both streaming paths are at-least-once (the
  * Kafka sink's own guarantee; foreachBatch re-sends a batch on
  * restart-before-commit) — same as the reference's shell pipe, which
  * had no delivery guarantee at all.
  *
  * Scale shape: `to_json` is codegen'd per row, the send path is
  * per-partition (no driver collect), and partition affinity via `key`
  * keeps a 1000-executor topology writing in parallel to all topic
  * partitions.
  */
object KafkaSink {

  /** The `ProducerRecord(topic, key, value)` surface — implemented by a
    * real Kafka producer at deployment, by an in-memory collector in
    * specs. Must be serializable: it ships to executors. */
  trait RowProducer extends Serializable {
    def send(topic: String, key: String, value: String): Unit
  }

  /** Canonical Kafka sink frame: (key, value, topic), value = the JSON
    * document of every input column (null fields dropped, like the
    * reference's parser output), key = NULL (keyless, console-producer
    * parity) or the `:`-joined `keyCols` tuple. Works on batch and
    * streaming frames alike. */
  def toKafkaFrame(df: DataFrame, topic: String, keyCols: Seq[String] = Nil): DataFrame = {
    val key =
      if (keyCols.isEmpty) lit(null).cast("string")
      else concat_ws(":", keyCols.map(c => col(c).cast("string")): _*)
    df.select(
      key.as("key"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"),
      lit(topic).as("topic"))
  }

  /** Streaming write through the real Kafka connector. Requires
    * `spark-sql-kafka-0-10` on the classpath — absent, `start()` fails
    * with Spark's find-data-source error naming the artifact. */
  def writeStream(df: DataFrame, bootstrapServers: String, topic: String,
      checkpointDir: String, keyCols: Seq[String] = Nil): StreamingQuery =
    toKafkaFrame(df, topic, keyCols)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming write through an injected producer — the connector-free
    * leg: the canonical frame is materialized per micro-batch and sent
    * per partition (no driver collect), exactly the rows and bytes the
    * `format("kafka")` path would hand the producer. */
  def writeStreamVia(df: DataFrame, topic: String, checkpointDir: String,
      producer: RowProducer, keyCols: Seq[String] = Nil): StreamingQuery =
    toKafkaFrame(df, topic, keyCols)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          rows.foreach { r =>
            producer.send(r.getString(2), if (r.isNullAt(0)) null else r.getString(0),
              r.getString(1))
          }
        }
      }
      .start()

  /** Batch-frame variant of the producer path (the reference's actual
    * usage was batch: parse a capture, pipe every line). */
  def writeBatchVia(df: DataFrame, topic: String, producer: RowProducer,
      keyCols: Seq[String] = Nil): Unit =
    toKafkaFrame(df, topic, keyCols)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          producer.send(r.getString(2), if (r.isNullAt(0)) null else r.getString(0),
            r.getString(1))
        }
      }
}
