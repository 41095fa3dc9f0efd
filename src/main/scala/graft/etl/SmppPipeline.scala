package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Stateful
import graft.operators.Stateful.Piece
import graft.sources.Pcap

/** SMPP end-to-end pipeline (`smpp_ingestor.py`): PSH+ACK segments →
  * length-prefixed PDU framing with cross-segment stash (R8 via the
  * generic reassembler) → whitelist decode (P16) → J2 correlation:
  * direction-canonicalized (endpoints, sequence_number) groups get the
  * last non-empty source/destination_addr propagated to all members
  * (`smpp_ingestor.py:355-408`) → frames_list dedup (D3,
  * `smpp_ingestor.py:330-339`).
  */
object SmppPipeline {

  final case class SmppRow(
      framesList: String,
      frameNo: Long,
      timeEpoch: Long,
      usecondsEpoch: Int,
      srcIp: String,
      dstIp: String,
      pcapFilename: String,
      commandId: String,
      sequenceNumber: Long,
      sourceAddr: String,
      destinationAddr: String,
      commandStatus: Long,
      corrKey: String)

  /** PDU length field = expected message length (framing + reassembly in
    * one machine). */
  private def pduLen(b: Array[Byte]): Int =
    if (b.length < 4) Int.MaxValue else graft.functions.BinaryCodecs.beLong(b, 0, 4).toInt

  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rows = Pcap.frames(spark, path)
      .flatMap(Packets.decode _)
      .filter(p => p.ipProto == Packets.ProtoTcp && p.tcpFlags == 24 && p.payload.nonEmpty)
      .groupByKey(p => (p.pcapFilename, p.srcIp, p.srcPort, p.dstIp, p.dstPort))
      .flatMapGroups { (key, it) =>
        val (file, srcIp, srcPort, dstIp, dstPort) = key
        Stateful.reassemble(
          it.map(p => Piece(p.frameNo, p.tsSec, p.tsUsec, p.srcIp, p.dstIp, p.pcapFilename, p.payload)).toSeq,
          pduLen)
          .flatMap { a =>
            Smpp.decodePdu(a.payload).map { pdu =>
              // J2 canonical direction: requests define forward; responses
              // reverse their endpoints so both sides share one key
              val isResp = (pdu.commandId & Smpp.RespBit) != 0
              val fwd =
                if (isResp) s"$dstIp:$dstPort>$srcIp:$srcPort"
                else s"$srcIp:$srcPort>$dstIp:$dstPort"
              SmppRow(a.framesList, a.firstFrame, a.tsSec, a.tsUsec, srcIp, dstIp, file,
                pdu.commandName, pdu.sequenceNumber, pdu.sourceAddr, pdu.destinationAddr,
                pdu.commandStatus, s"$fwd#${pdu.sequenceNumber}")
            }
          }
      }
      .toDF()
    correlateAndDedup(rows).drop("frameNo", "corrKey")
  }

  /** J2 + D3, factored for the q33 oracle query: last-non-empty
    * source/destination_addr propagated across the canonical
    * (file, corrKey) group, then frames_list-based output dedup with a
    * deterministic keeper. */
  def correlateAndDedup(rows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pcapFilename"), col("corrKey"))
      .orderBy(col("frameNo"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rows
      .withColumn("sourceAddr",
        coalesce(last(nullif(col("sourceAddr"), lit("")), ignoreNulls = true).over(w), lit("")))
      .withColumn("destinationAddr",
        coalesce(last(nullif(col("destinationAddr"), lit("")), ignoreNulls = true).over(w), lit("")))
      // D3: frames_list-based output dedup, deterministic keeper
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pcapFilename"), col("framesList"), col("commandId"))
          .orderBy(col("frameNo"))))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
