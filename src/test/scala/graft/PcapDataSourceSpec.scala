package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._

class PcapDataSourceSpec extends AnyFunSuite {

  test("""spark.read.format("pcap") reads frames, one partition per file""") {
    val dir = Files.createTempDirectory("graftdsv2")
    Files.write(dir.resolve("a.pcap"), pcapFile(Seq(
      (100L, 1, ether(Array[Byte](1, 2))), (101L, 2, ether(Array[Byte](3))))))
    Files.write(dir.resolve("b.pcap"), pcapFile(Seq(
      (200L, 3, ether(Array[Byte](4))))))

    val spark = SparkTest.spark
    val df = spark.read.format("pcap").load(dir.toString + "/*.pcap")
    assert(df.schema.fieldNames.toSeq ==
      Seq("pcapFilename", "frameNo", "tsSec", "tsUsec", "dlt", "data"))
    val rows = df.collect().sortBy(r => (r.getAs[String]("pcapFilename"), r.getAs[Long]("frameNo")))
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("tsSec") == 100L && rows(0).getAs[Int]("tsUsec") == 1)
    assert(rows(0).getAs[Array[Byte]]("data").sameElements(ether(Array[Byte](1, 2))))
    // one file = one input partition (order-preserving parallelism unit)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("column pruning reaches the reader (no payload for meta-only queries)") {
    val dir = Files.createTempDirectory("graftdsv2p")
    Files.write(dir.resolve("a.pcap"), pcapFile(Seq((100L, 1, ether(Array[Byte](9))))))
    val spark = SparkTest.spark
    val df = spark.read.format("pcap").load(dir.toString + "/a.pcap")
      .select("frameNo", "tsSec")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("frameNo"))
    assert(!plan.contains("data#") || !plan.substring(plan.indexOf("Scan")).contains("data#"),
      s"payload column should be pruned from the scan:\n$plan")
    assert(df.collect().head.getLong(0) == 1L)
  }
}
