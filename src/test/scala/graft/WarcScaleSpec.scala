package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** The written receipt for the WARC parallelism story (VERDICT r10 #5):
  * a multi-file segment batch must fan out one-file-per-task (not ride
  * binaryFiles' default 2 combined splits), and ONE oversized file must
  * fan out into ranged tasks on the chunked path. */
class WarcScaleSpec extends AnyFunSuite {

  private def rec(uri: String, body: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n")
      .getBytes("UTF-8")

  test("an 8-file segment batch reads with >= 8 tasks (one file per task)") {
    val spark = SparkTest.spark
    val dir = java.nio.file.Files.createTempDirectory("warcscale")
    // files must exceed binaryFiles' 4 MB open-cost combining floor —
    // the representative regime (real segments are ~1 GB); sub-4 MB toy
    // files get packed into combined splits by design
    val body = "z" * 4000
    var perFile = 0
    val out = new java.io.ByteArrayOutputStream()
    while (out.size() <= 5 * 1024 * 1024) {
      out.write(rec(s"http://host/page$perFile", body)); perFile += 1
    }
    val fileBytes = out.toByteArray
    (0 until 8).foreach(f =>
      java.nio.file.Files.write(dir.resolve(f"seg$f%02d.warc"), fileBytes))
    // Spark's own heuristic matches splits to cores (local[4] here →
    // ~2-4 combined splits); the explicit override must spread the
    // batch one-file-per-task even on a low-parallelism context. The
    // hint feeds split-size = (total + 4 MB open-cost per file) /
    // minPartitions, so 16 pushes the split below one 5 MB file →
    // every file its own task
    val df = Warc.records(spark, s"$dir/*.warc", minPartitions = 16)
    assert(df.rdd.getNumPartitions >= 8,
      s"expected >= 8 tasks for 8 files, got ${df.rdd.getNumPartitions}")
    assert(df.count() === 8L * perFile)
    val auto = Warc.records(spark, s"$dir/*.warc").rdd.getNumPartitions
    assert(auto >= 2, s"heuristic split count should track cores, got $auto")
  }

  test("one oversized file fans out into >= 8 ranged tasks on the chunked path") {
    val spark = SparkTest.spark
    val dir = java.nio.file.Files.createTempDirectory("warcchunkscale")
    val out = new java.io.ByteArrayOutputStream()
    var r = 0
    while (out.size() < 9 * (1 << 16)) { // > 8 x 64 KiB chunks
      out.write(rec(s"http://big/page$r", s"body $r " + ("y" * 500)))
      r += 1
    }
    val p = dir.resolve("big.warc")
    java.nio.file.Files.write(p, out.toByteArray)
    val df = Warc.recordsChunked(spark, p.toString, 1L << 16)
    assert(df.rdd.getNumPartitions >= 8,
      s"expected >= 8 ranged tasks, got ${df.rdd.getNumPartitions}")
    assert(df.count() === r.toLong)
  }
}
