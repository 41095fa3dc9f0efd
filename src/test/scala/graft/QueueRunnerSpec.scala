package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.etl.{DiameterPipeline, QueueRunner}

class QueueRunnerSpec extends AnyFunSuite {

  test("queue rows per file with per-file failure quarantine") {
    val dir = Files.createTempDirectory("graftqueue")
    val msg = diameterMsg(request = true, 272, 1, 1, strAvp(263, "s"))
    val good = pcapFile(Seq((100L, 0, ether(ipv4(132, Array[Byte](1, 1, 1, 1),
      Array[Byte](2, 2, 2, 2), sctpData(3868, 3868, 0, 0, 46L, msg))))))
    Files.write(dir.resolve("good.pcap"), good)
    Files.write(dir.resolve("junk.pcap"), "this is not a pcap at all".getBytes)

    val entries = QueueRunner.run(SparkTest.spark, dir.toString + "/*.pcap", 7L,
      (s, p) => DiameterPipeline.records(s, p).toDF())
      .sortBy(_.filename)
    assert(entries.size == 2)
    val goodRow = entries.find(_.filename.endsWith("good.pcap")).get
    assert(goodRow.state == 2 && goodRow.processed == 1L)
    assert(goodRow.ingestionInstanceId == 7L && goodRow.pid > 0)
    // junk file: decoder yields no frames → 0 records, still state=done
    val junkRow = entries.find(_.filename.endsWith("junk.pcap")).get
    assert(junkRow.state == 2 && junkRow.processed == 0L)
  }
}
