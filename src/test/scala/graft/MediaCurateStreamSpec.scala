package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.JvmImageCodec
import graft.streaming.MediaCurateStream

/** Streaming media curation front: gates agree with the batch chain
  * (shared kernel), the md5 dedup keeps the first arrival within the
  * horizon, and survivors carry the batch-identical dHash. The dedup
  * operator is timer-free (dropDuplicatesWithinWatermark), so waits
  * are deterministic StreamSync.drain. */
class MediaCurateStreamSpec extends AnyFunSuite {

  private val spark = SparkTest.spark

  private def png(shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 9).foreach(x => {
      val v = shade + x * 11 + y * 7
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }))
    JvmImageCodec.encodePng(img)
  }

  private def uniform(v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 9).foreach(x =>
      img.setRGB(x, y, (v << 16) | (v << 8) | v)))
    JvmImageCodec.encodePng(img)
  }

  test("gate + exact dedup within watermark; survivor dhash equals the batch kernel's") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1000000L
    val good = png(40)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaCurateStream.gateExactWithinWatermark(
      input.toDS().toDF("img_id", "png", "ts"), "img_id", "png", "ts",
      "10 seconds", minW = 8, minH = 8, minSpread = 10, maxAspect = 4)
      .writeStream.format("memory").queryName("media_curate_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData(
        (1L, good, new Timestamp(t0)),
        (2L, uniform(128), new Timestamp(t0)), // gated: spread 0
        (3L, Array[Byte](1, 2, 3), new Timestamp(t0))) // gated: undecodable
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM media_curate_stream").count() == 1
      })
      // batch 2: a byte-identical repeat inside the horizon is dropped;
      // a new good image survives
      input.addData(
        (4L, good, new Timestamp(t0 + 1000)),
        (5L, png(60), new Timestamp(t0 + 1000)))
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM media_curate_stream").count() == 2
      })
      val got = spark.sql(
        "SELECT media_id, dhash FROM media_curate_stream ORDER BY media_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expectedHash = JvmImageCodec.dHash(JvmImageCodec.decodeImage(good).get)
      assert(got.map(_._1) === Seq(1L, 5L))
      assert(got.head._2 === expectedHash) // the batch kernel's own dHash
    } finally q.stop()
  }
}
