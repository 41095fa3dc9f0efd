package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Pcap

/** GTP end-to-end slice (SURVEY §7.1 step 3; `gtp_ingestor.py`):
  * no reassembly — decode + J3 per-sequence-number enrichment.
  *
  * J3 (`gtp_ingestor.py:42-71,325-339`): rows sharing a gtp_seq_number
  * get msisdn/imsi overwritten by the group's LAST non-*empty* value —
  * `last(nullif(col,''), ignoreNulls)` over an unbounded window ordered
  * by frame, exactly the reference's copy_msisdn/copy_imsi.
  */
object GtpPipeline {

  final val PortGtpC = 2123
  final val PortGtpCv1 = 2123
  final val PortGtpU = 2152

  final case class GtpRow(
      framesList: String,
      frameNo: Long,
      timeEpoch: Long,
      usecondsEpoch: Int,
      srcIp: String,
      dstIp: String,
      pcapFilename: String,
      gtpVersion: String,
      gtpMessage: String,
      gtpTeid: Long,
      gtpCause: String,
      gtpSeqNumber: Long,
      imsi: String,
      msisdn: String)

  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val decoded = Pcap.frames(spark, path)
      .flatMap(Packets.decode _)
      .filter(p => p.ipProto == Packets.ProtoUdp
        && (p.srcPort == PortGtpC || p.dstPort == PortGtpC
          || p.srcPort == PortGtpU || p.dstPort == PortGtpU))
      .flatMap { p =>
        Gtp.decode(p.payload).map(g => GtpRow(p.frameNo.toString, p.frameNo,
          p.tsSec, p.tsUsec, p.srcIp, p.dstIp, p.pcapFilename,
          g.gtpVersion, g.gtpMessage, g.gtpTeid, g.gtpCause, g.gtpSeqNumber,
          g.imsi, g.msisdn))
      }
      .toDF()
    enrich(decoded).drop("frameNo")
  }

  /** J3: last-non-empty imsi/msisdn wins within (file, gtp_seq_number) —
    * empty string ≠ null, so nullif first (SURVEY §2.11). Factored so the
    * q32 oracle query exercises the identical window logic. */
  def enrich(decoded: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pcapFilename"), col("gtpSeqNumber"))
      .orderBy(col("frameNo"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    decoded
      .withColumn("imsi",
        coalesce(last(nullif(col("imsi"), lit("")), ignoreNulls = true).over(w), lit("")))
      .withColumn("msisdn",
        coalesce(last(nullif(col("msisdn"), lit("")), ignoreNulls = true).over(w), lit("")))
  }
}
