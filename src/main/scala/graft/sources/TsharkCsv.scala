package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.etl.{Sigshark, TcapPkt}

/** S6 compat source: the reference tool's tshark CSV extract
  * (`sigshark.py:380-429` — `tshark -Tfields -Eseparator=, -Eoccurrence=a
  * -Eaggregator=-` over 21 named fields). The engine's native path
  * decodes pcap directly ([[graft.etl.GsmMapPipeline.tcapPackets]],
  * SURVEY §7 eliminates the tshark subprocess by design), but a user
  * arriving with an EXISTING extract gets a drop-in here: the same
  * 21-column headerless CSV in, the same TCAP transaction machine out.
  *
  * Fidelity notes (vs `get_pcap_tas`):
  *   - the SCTP/encap gate and the one-chunk-per-packet guard are
  *     reproduced exactly (multi-chunk rows fail the job with the
  *     tool's own "--flatten" remedy);
  *   - frame numbers are converted to the tool's 0-based convention
  *     (`int(frame) - 1`);
  *   - rows carrying sccp segment / sctp fragment lists expand them
  *     into the transaction's frame list exactly like the tool
  *     (`sigshark.py:460-466`: segs then frags, each `int(f) - 1`,
  *     replacing the row's own frame number).
  */
object TsharkCsv {

  /** The reference's field order (`sigshark.py:383-401`). */
  val Columns: Seq[String] = Seq(
    "encap", "frame", "epoch", "ip_src", "ip_dst",
    "cg_ssn", "cg_digits", "cd_ssn", "cd_digits", "sccp_segs",
    "tcap_otid", "tcap_dtid", "tcap_begin", "tcap_continue", "tcap_end",
    "tcap_abort", "dia_request", "dia_hbh", "dia_e2e", "sctp_frags", "sctp")

  /** Supported `frame.encap_type` values without SCTP (`sigshark.py:431`). */
  private val SupportedEncaps = Set("42", "43", "75", "101")

  private def hexTid(s: String): Long = {
    val clean = s.replace(":", "").trim
    if (clean.isEmpty) 0L else java.lang.Long.parseUnsignedLong(clean, 16)
  }

  private def intOr0(s: String): Int = {
    val t = s.trim
    if (t.isEmpty) 0 else t.toInt
  }

  /** Parse the tool's CSV into [[TcapPkt]] rows ready for
    * [[graft.etl.Sigshark.sessionize]]. `captureName` becomes the
    * machine's grouping key (the tool processes one capture per run). */
  def tcapPackets(spark: SparkSession, csvPath: String,
      captureName: String = ""): Dataset[TcapPkt] = {
    import spark.implicits._
    val name = if (captureName.nonEmpty) captureName else csvPath
    val schema = StructType(Columns.map(c => StructField(c, StringType, nullable = true)))
    spark.read.schema(schema).option("header", "false").csv(csvPath)
      .na.fill("")
      .as[(String, String, String, String, String, String, String, String, String, String,
        String, String, String, String, String, String, String, String, String, String, String)]
      .flatMap { case (encap, frame, epoch, _, _, cgSsn, cgDigits, cdSsn, cdDigits, sccpSegs,
        otid, dtid, beginE, contE, endE, abortE, diaReq, _, _, sctpFrags, sctp) =>
        // the tool's transport gate (`sigshark.py:431`)
        if (sctp.isEmpty && !SupportedEncaps.contains(encap.trim)) None
        else {
          // one TCAP/Diameter chunk per packet or the tool refuses
          // (`sigshark.py:434-438`)
          require((beginE + contE + endE + abortE + diaReq).length <= 1,
            "tshark csv contains more than one chunk per sctp packet - " +
              "re-extract from a --flatten'd capture")
          val messType =
            if (beginE.nonEmpty) "begin"
            else if (contE.nonEmpty) "continue"
            else if (endE.nonEmpty) "end"
            else if (abortE.nonEmpty) "abort"
            else "" // diameter / non-tcap rows: the TCAP machine ignores them
          if (messType.isEmpty) None
          else {
            val (sec, usec) = {
              val e = epoch.trim
              val dot = e.indexOf('.')
              if (dot < 0) (e.toLong, 0)
              else (e.substring(0, dot).toLong,
                (e.substring(dot + 1) + "000000").substring(0, 6).toInt)
            }
            // the tool's fragment expansion (`sigshark.py:460-466`): a
            // reassembled row contributes its '-'-joined sccp segment /
            // sctp fragment frame lists (each int(f)-1) INSTEAD of its
            // own frame number; segs first, then frags, tool order
            val fragFrames: Seq[Long] =
              (sccpSegs.trim.split('-').toSeq ++ sctpFrags.trim.split('-').toSeq)
                .filter(_.nonEmpty).map(_.trim.toLong - 1)
            Some(TcapPkt(name, frame.trim.toLong - 1, sec, usec, messType,
              hexTid(otid), hexTid(dtid),
              intOr0(cgSsn), cgDigits.trim, intOr0(cdSsn), cdDigits.trim,
              frameNos = fragFrames))
          }
        }
      }
  }

  /** The tool's main output from its own CSV: tracked TCAP transactions
    * (`keepPartial` = `--incomplete`). */
  def tcapTransactions(spark: SparkSession, csvPath: String,
      keepPartial: Boolean = false, captureName: String = ""): Dataset[Sigshark.Transaction] =
    Sigshark.sessionize(tcapPackets(spark, csvPath, captureName), keepPartial)
}
