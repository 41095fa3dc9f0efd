package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ShardWriterStream

/** Streaming shard writer: rows append into shard=<k>/ partitioned
  * parquet across micro-batches, shard-pruned reads see only their
  * directory, and the manifest aggregates the committed files. The
  * file sink has no processing-time semantics → deterministic
  * [[StreamSync.drain]].
  */
class ShardWriterStreamSpec extends AnyFunSuite {

  test("cross-batch appends land in shard directories; manifest totals match") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("shardstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("shardstreamckpt").toString
    val input = MemoryStream[(Long, Long, Long)]
    val q = ShardWriterStream.start(
      input.toDS().toDF("doc_id", "shard", "n_tokens"), "shard", out, ckpt)
    try {
      input.addData((1L, 0L, 10L), (2L, 1L, 20L), (3L, 0L, 30L))
      q.processAllAvailable()
      input.addData((4L, 1L, 40L), (5L, 2L, 50L))
      q.processAllAvailable()
      // shard-pruned read touches one directory
      val shard0 = spark.read.parquet(out).filter(col("shard") === 0)
        .select("doc_id").as[Long].collect().toSet
      assert(shard0 == Set(1L, 3L))
      val man = ShardWriterStream.manifest(spark, out, "shard", "n_tokens")
        .orderBy("shard").as[(Long, Long, Long)].collect().toSeq
      assert(man == Seq((0L, 2L, 40L), (1L, 2L, 60L), (2L, 1L, 50L)))
    } finally q.stop()
  }
}
