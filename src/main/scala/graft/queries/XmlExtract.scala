package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{HttpMsg, HttpOcs, HttpSs7, XmlBody}

/** Oracle-checked exercises of the http_ss7/http_ocs XML extraction
  * scalar logic (the per-operation-type field tables of
  * `http_ss7_ingestor.py:303-456` / `http_ocs_ingestor.py:256-461`).
  *
  * Spark SYNTHESIZES an XML body from `documents` columns and runs the
  * real extraction code (scala.xml path); the DuckDB oracle computes the
  * expected field values independently with string functions. Agreement
  * checks the whitelist gate, the `#text` attribute rule, F13 unescape,
  * F14 truncate, F18 bool parsing, and int coercion — against an
  * implementation that shares no code with the extractor.
  */
object XmlExtract {

  private def env(file: String, frame: Long, body: String) = HttpMsg(
    framesList = frame.toString, firstFrame = frame, timeEpoch = 0L,
    usecondsEpoch = 0, srcIp = "10.0.0.1", dstIp = "10.0.0.2",
    pcapFilename = file, srcPort = 1, dstPort = 2, tcpSequence = 0L,
    tcpAcknowledge = 0L, httpIsRequest = true, method = "POST",
    uri = "u", responseCode = None, contentType = "text/xml",
    contentLength = Some(body.length), bodyType = "content", body = body)

  /** doc_id % 3 routes each document to an smsmo body (0), an sriForSm
    * body (1), or an unknown root (2 — emitted with null type). */
  val q21Ss7Extract: Q = Q(
    "q21_ss7_extract",
    """WITH d AS (SELECT doc_id, CAST(doc_id * 7919 AS VARCHAR) AS dg, doc_id % 3 AS m3 FROM documents)
      |SELECT doc_id,
      |  CASE m3 WHEN 0 THEN 'smsmo' WHEN 1 THEN 'sriForSm' END AS op_type,
      |  CASE m3 WHEN 0 THEN '52&' || dg WHEN 1 THEN '52' || dg END AS msisdn_orig,
      |  CASE m3 WHEN 0 THEN repeat('9', 29) || '...' END AS msisdn_dest,
      |  CASE WHEN m3 IN (0, 1) THEN 'msc' || dg END AS msc,
      |  CASE m3 WHEN 1 THEN 'cd' || dg END AS sccp_cd_adr,
      |  CASE WHEN m3 IN (0, 1) THEN '7' || dg END AS imsi,
      |  CASE m3 WHEN 0 THEN 's' || dg END AS session_id,
      |  CASE m3 WHEN 0 THEN doc_id % 2 = 0 END AS udhi
      |FROM d
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val dg = (id * 7919).toString
        val body = (id % 3) match {
          case 0 =>
            s"""<smsmo><orig x="1">52&amp;$dg</orig><dest x="1">${"9" * 40}$dg</dest>""" +
              s"""<msc x="1">msc$dg</msc><imsi>7$dg</imsi>""" +
              s"""<smsSubmit><udhi>${if (id % 2 == 0) "true" else "no"}</udhi></smsSubmit>""" +
              s"""<sessionId>s$dg</sessionId></smsmo>"""
          case 1 =>
            s"""<sriForSm><sccpCdAdr x="1">cd$dg</sccpCdAdr><msisdn x="1">52$dg</msisdn>""" +
              s"""<imsi>7$dg</imsi><msc x="1">msc$dg</msc></sriForSm>"""
          case _ => s"<bogusOp><a>$dg</a></bogusOp>"
        }
        val m = HttpSs7.extract(env("q21", id, body)).get
        (id, m.opType, m.msisdnOrig, m.msisdnDest, m.msc, m.sccpCdAdr,
          m.imsi, m.sessionId, m.udhi)
      }
      .toDF("doc_id", "op_type", "msisdn_orig", "msisdn_dest", "msc",
        "sccp_cd_adr", "imsi", "session_id", "udhi")
      .orderBy(col("doc_id"))
  }

  private val OcsTypesSorted = XmlBody.OcsOperationTypes.toSeq.sorted

  /** doc_id % 18 picks one of the 17 whitelisted operation types or (17)
    * a non-whitelisted root — which the P13 gate must DROP, so the
    * result has fewer rows than `documents`. */
  val q22OcsExtract: Q = {
    val typeCase = OcsTypesSorted.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ")
    Q(
      "q22_ocs_extract",
      s"""WITH d AS (SELECT doc_id, CAST(doc_id * 7919 AS VARCHAR) AS dg, doc_id % 18 AS m FROM documents)
         |SELECT doc_id,
         |  CASE m $typeCase END AS op_type,
         |  CAST(doc_id % 100 AS INTEGER) AS operation_id,
         |  'cd' || dg AS cdpa,
         |  '52' || dg AS msisdn,
         |  CAST(doc_id % 1000 AS INTEGER) AS period_duration,
         |  doc_id % 2 = 0 AS call_active,
         |  't1-' || dg AS start_time,
         |  CAST(doc_id % 7 AS INTEGER) AS status_code,
         |  CAST(334 AS INTEGER) AS mcc,
         |  CAST(doc_id % 99 AS INTEGER) AS mnc,
         |  '7' || dg AS imsi
         |FROM d
         |WHERE m < 17
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val dg = (id * 7919).toString
          val root =
            if (id % 18 < 17) OcsTypesSorted((id % 18).toInt) else "nope-op"
          val body =
            s"""<$root id="${id % 100}"><cdpa>cd$dg</cdpa><msisdn>52$dg</msisdn>""" +
              s"""<periodduration>${id % 1000}</periodduration>""" +
              s"""<callactive>${if (id % 2 == 0) "TRUE" else "off"}</callactive>""" +
              s"""<starttime>t1-$dg</starttime><starttime>t2</starttime>""" +
              s"""<status_code>${id % 7}</status_code><mcc>334</mcc>""" +
              s"""<mnc>${id % 99}</mnc><imsi>7$dg</imsi></$root>"""
          HttpOcs.extract(env("q22", id, body)).map { m =>
            (id, m.opType, m.operationId, m.cdpa, m.msisdn, m.periodDuration,
              m.callActive, m.startTime, m.statusCode, m.mcc, m.mnc, m.imsi)
          }
        }
        .toDF("doc_id", "op_type", "operation_id", "cdpa", "msisdn",
          "period_duration", "call_active", "start_time", "status_code",
          "mcc", "mnc", "imsi")
        .orderBy(col("doc_id"))
    }
  }

  val all: Seq[Q] = Seq(q21Ss7Extract, q22OcsExtract)
}
