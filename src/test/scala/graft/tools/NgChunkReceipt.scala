package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Receipt harness for the chunked pcapng read path: streams a large
  * synthetic pcapng capture to disk (SHB + IDB + fixed-size EPBs),
  * then times whole-file vs `chunkBytes`-ranged DSv2 reads of the SAME
  * file — count and payload-byte-sum, verified equal. Run via
  * `sbt "Test/runMain graft.tools.NgChunkReceipt <sizeMiB> [chunkMiB]"`.
  * Past 2 GiB the whole-file path refuses by design (single byte[]);
  * the harness prints the refusal and the chunked result that replaces
  * it. */
object NgChunkReceipt {
  private def le32(out: Array[Byte], off: Int, v: Long): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte
    out(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** One EPB with a `payload`-byte body, µs-epoch ticks. */
  private def epb(tsMicros: Long, payload: Int): Array[Byte] = {
    val pad = (4 - payload % 4) % 4
    val len = 12 + 20 + payload + pad
    val b = new Array[Byte](len)
    le32(b, 0, 6L); le32(b, 4, len.toLong)
    le32(b, 8, 0L) // interface 0
    le32(b, 12, tsMicros >>> 32); le32(b, 16, tsMicros & 0xffffffffL)
    le32(b, 20, payload.toLong); le32(b, 24, payload.toLong)
    java.util.Arrays.fill(b, 28, 28 + payload, 0x5a.toByte)
    le32(b, len - 4, len.toLong)
    b
  }

  def main(args: Array[String]): Unit = {
    val sizeMiB = args.headOption.map(_.toInt).getOrElse(400)
    val chunkMiB = args.lift(1).map(_.toInt).getOrElse(64)
    val payload = 2000
    val dir = Files.createTempDirectory("ngreceipt")
    val path = dir.resolve("big.pcapng")
    val target = sizeMiB.toLong << 20
    val out = new BufferedOutputStream(new FileOutputStream(path.toFile), 1 << 20)
    var written = 0L
    var frames = 0L
    try {
      val shb = new Array[Byte](28)
      le32(shb, 0, 0x0a0d0d0aL); le32(shb, 4, 28L); le32(shb, 8, 0x1a2b3c4dL)
      le32(shb, 12, 0x00010000L); le32(shb, 16, 0xffffffffL); le32(shb, 20, 0xffffffffL)
      le32(shb, 24, 28L)
      val idb = new Array[Byte](20)
      le32(idb, 0, 1L); le32(idb, 4, 20L); le32(idb, 8, 1L) // dlt 1
      le32(idb, 12, 65535L); le32(idb, 16, 20L)
      out.write(shb); out.write(idb); written = 48
      while (written < target) {
        val b = epb(1700000000000000L + frames, payload)
        out.write(b); written += b.length; frames += 1
      }
    } finally out.close()
    println(s"[receipt] wrote $path: $written bytes, $frames frames")

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ng-chunk-receipt")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[receipt] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val glob = dir.toString + "/*.pcapng"
    def run(label: String, chunk: Option[Long]): (Long, Long, Int) = {
      val r = spark.read.format("pcap")
      chunk.foreach(c => r.option("chunkBytes", c.toString))
      val df = r.load(glob)
      val parts = df.rdd.getNumPartitions
      val n = time(s"$label count ($parts tasks)")(df.count())
      val s = time(s"$label payload-sum")(
        df.selectExpr("sum(length(data)) AS s").collect()(0).getLong(0))
      (n, s, parts)
    }
    val chunked = run("chunked", Some(chunkMiB.toLong << 20))
    println(s"[receipt] chunked: frames=${chunked._1} bytes=${chunked._2} tasks=${chunked._3}")
    try {
      val whole = run("whole-file", None)
      println(s"[receipt] whole: frames=${whole._1} bytes=${whole._2}")
      assert(whole._1 == chunked._1 && whole._2 == chunked._2, "chunked != whole-file")
      println("[receipt] chunked == whole-file: exact")
    } catch {
      case e: org.apache.spark.SparkException =>
        println(s"[receipt] whole-file refused (expected past 2 GiB): ${e.getCause}")
        assert(chunked._1 == frames && chunked._2 == frames * payload,
          "chunked totals != generated totals")
        println("[receipt] chunked totals match the generated capture exactly")
    }
    val fs = Files.size(path)
    Files.delete(path); Files.delete(dir)
    println(s"[receipt] done ($fs bytes cleaned up)")
  }
}
