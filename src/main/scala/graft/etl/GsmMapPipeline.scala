package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Pcap

/** SS7 GSM-MAP end-to-end (SURVEY §3 `gsm_map.py` shape):
  * pcap → SCTP chunks (PPID 3) → M3UA unwrap → SCCP parse →
  * (optional R6 segmentation reassembly keyed by segmentation ref) →
  * TCAP targeted BER parse → flat ss7map rows (`models.py:30-50`).
  */
/** R6 regroup key: one segmented SCCP message per (file, endpoints,
  * segmentation reference). Top-level so Spark's bean/encoder codegen can
  * construct it. */
final case class SegKey(file: String, srcIp: String, dstIp: String, ref: Long)

object GsmMapPipeline {

  final case class Ss7Row(
      framesList: String,
      timeEpoch: Long,
      usecondsEpoch: Int,
      srcIp: String,
      dstIp: String,
      pcapFilename: String,
      mtp3Opc: Int,
      mtp3Dpc: Int,
      tcapMessType: String,
      tcapTid: Long,
      tcapOtid: Long,
      tcapDtid: Long,
      gsmComponent: Int,
      gsmOpCode: Int,
      gsmErrorCode: Int,
      imsi: String,
      msisdn: String)

  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val sccp = Pcap.frames(spark, path)
      .flatMap(Packets.decode _)
      .filter(_.ipProto == Packets.ProtoSctp)
      .flatMap(Packets.sctpChunks _)
      .filter(c => c.chunkType == 0 && c.ppid == GsmMap.PpidM3ua && c.payload.nonEmpty)
      .flatMap { c =>
        GsmMap.m3uaData(c.payload).flatMap { case (opc, dpc, _, data) =>
          GsmMap.sccpParse(opc, dpc, data).map(m => (c, m))
        }
      }

    val direct = sccp.filter(_._2.segmentation.isEmpty)
      .flatMap { case (c, m) => toRow(c, m, m.data, c.frameNo.toString) }

    val segmented = sccp.filter(_._2.segmentation.isDefined)
      .groupByKey { case (c, m) => SegKey(c.pcapFilename, c.srcIp, c.dstIp, m.segmentation.get._3) }
      .flatMapGroups { (_, it) =>
        val parts = it.toSeq.sortBy(_._1.frameNo)
        val frames = parts.map(_._1.frameNo).mkString(" ")
        GsmMap.reassembleSegments(parts.map(_._2)).toSeq.flatMap { data =>
          val (c, m) = parts.head
          toRow(c, m, data, frames)
        }
      }

    direct.union(segmented).toDF()
  }

  private def toRow(c: SctpChunk, m: SccpMsg, data: Array[Byte], frames: String): Option[Ss7Row] =
    GsmMap.tcapParse(data).map { t =>
      Ss7Row(frames, c.tsSec, c.tsUsec, c.srcIp, c.dstIp, c.pcapFilename,
        m.opc, m.dpc, t.messType, t.tcapTid, t.otid, t.dtid,
        t.gsmComponent, t.gsmOpCode, t.gsmErrorCode, t.imsi, t.msisdn)
    }
}
