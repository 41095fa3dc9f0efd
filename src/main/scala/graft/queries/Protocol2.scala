package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{GsmMap, GtpPipeline, HttpSs7, SccpAddr, SccpMsg, SmppPipeline}

/** Second batch of synthesize-input oracle queries over the remaining
  * unit-only operators (same pattern as [[Protocol]]): the GTP J3
  * enrichment window, the SMPP J2 propagation + D3 dedup, R6 SCCP
  * segmentation reassembly, and the R4/J5/D4 pair-and-enrich machine.
  */
object Protocol2 {

  // ---------------------------------------------------------------------
  // q32: J3 — rows sharing (file, gtp_seq_number) get the group's LAST
  // non-EMPTY imsi/msisdn (`gtp_ingestor.py:42-71,325-339`), via the
  // real GtpPipeline.enrich window. Groups of 5 docs: imsi set only at
  // step 2, msisdn at steps 1 and 3 (3 must win).
  // ---------------------------------------------------------------------

  val q32GtpEnrich: Q = Q(
    "q32_gtp_enrich",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      |d AS (SELECT doc_id, doc_id//5 AS g FROM documents)
      |SELECT doc_id,
      |  CASE WHEN 5*g+2 <= m THEN '7'||CAST((5*g+2)*7919 AS VARCHAR) ELSE '' END AS imsi,
      |  CASE WHEN 5*g+3 <= m THEN '52'||CAST((5*g+3)*7919 AS VARCHAR)
      |       WHEN 5*g+1 <= m THEN '52'||CAST((5*g+1)*7919 AS VARCHAR)
      |       ELSE '' END AS msisdn
      |FROM d, mx ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val rows = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val g = id / 5
        val step = (id % 5).toInt
        val dg = (id * 7919).toString
        val imsi = if (step == 2) "7" + dg else ""
        val msisdn = if (step == 1 || step == 3) "52" + dg else ""
        (id, "f" + (g % 3), g, imsi, msisdn)
      }
      .toDF("frameNo", "pcapFilename", "gtpSeqNumber", "imsi", "msisdn")
    GtpPipeline.enrich(rows)
      .select(col("frameNo").as("doc_id"), col("imsi"), col("msisdn"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q33: J2 + D3 — responses inherit the canonical-direction group's
  // last non-empty addresses; duplicate (file, frames_list, command)
  // rows collapse to the earliest frame (`smpp_ingestor.py:330-408`).
  // ---------------------------------------------------------------------

  val q33SmppPropagate: Q = Q(
    "q33_smpp_propagate",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg FROM documents),
      |r AS (
      |  SELECT doc_id*10 AS row_id, 'submit_sm' AS command_id,
      |         '52'||dg AS source_addr, '1'||dg AS destination_addr FROM d
      |  UNION ALL
      |  SELECT doc_id*10+1, 'submit_sm_resp', '52'||dg, '1'||dg FROM d)
      |SELECT row_id, command_id, source_addr, destination_addr
      |FROM r ORDER BY row_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val rows = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val base = id * 10
        val f = "f" + (id % 3)
        val r1 = (base, base.toString, f, "submit_sm", "52" + dg, "1" + dg, "k" + id)
        val r2 = (base + 1, (base + 1).toString, f, "submit_sm_resp", "", "", "k" + id)
        // same (file, frames_list, command) → D3 must drop it
        val dup = (base + 2, base.toString, f, "submit_sm", "52" + dg, "1" + dg, "k" + id)
        Seq(r1, r2) ++ (if (id % 4 == 0) Seq(dup) else Nil)
      }
      .toDF("frameNo", "framesList", "pcapFilename", "commandId",
        "sourceAddr", "destinationAddr", "corrKey")
    SmppPipeline.correlateAndDedup(rows)
      .select(col("frameNo").as("row_id"), col("commandId").as("command_id"),
        col("sourceAddr").as("source_addr"), col("destinationAddr").as("destination_addr"))
      .orderBy(col("row_id"))
  }

  // ---------------------------------------------------------------------
  // q34: R6 — SCCP XUDT segmentation reassembly (`gsm_map.py:211-242`):
  // first segment stores, middles append, remaining==0 finalizes;
  // a reference that never sees remaining==0 yields nothing
  // (doc_id % 7 == 0 drops its final segment).
  // ---------------------------------------------------------------------

  val q34SccpSegments: Q = Q(
    "q34_sccp_segments",
    """SELECT doc_id, text AS body FROM documents
      |WHERE doc_id % 7 <> 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val b = text.getBytes("UTF-8")
        val n = b.length
        def part(a: Int, z: Int) = java.util.Arrays.copyOfRange(b, a, z)
        def seg(first: Boolean, remaining: Int, data: Array[Byte]) =
          SccpMsg(1, 2, 17, data, Some((first, remaining, id)),
            SccpAddr(0, ""), SccpAddr(0, ""))
        val parts = Seq(
          seg(first = true, 2, part(0, n / 3)),
          seg(first = false, 1, part(n / 3, 2 * n / 3)),
          seg(first = false, 0, part(2 * n / 3, n)))
        val used = if (id % 7 == 0) parts.init else parts
        GsmMap.reassembleSegments(used).map(buf => (id, new String(buf, "UTF-8")))
      }
      .toDF("doc_id", "body")
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q35: R4/J5/D4 — the seq-arithmetic pair machine
  // (`http_ss7_ingestor.py:459-520` shape): requests keyed by ack,
  // responses by seq, full-outer pairing with bidirectional
  // empty-as-missing enrichment, first-per-slot dedup, and unlinked
  // rows on both sides.
  // ---------------------------------------------------------------------

  val q35PairEnrich: Q = Q(
    "q35_pair_enrich",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg FROM documents)
      |SELECT doc_id*100 AS ord, doc_id%5<>0 AS matched,
      |  CASE WHEN doc_id%5<>0 THEN 'linked' ELSE 'unlinked' END AS link_state,
      |  '52'||dg AS q_msisdn_orig,
      |  CASE WHEN doc_id%5<>0 THEN '7'||dg END AS q_imsi,
      |  '52'||dg AS r_msisdn_orig,
      |  CASE WHEN doc_id%5<>0 THEN '7'||dg END AS r_imsi
      |FROM d
      |UNION ALL
      |SELECT doc_id*100+60, false, 'unlinked', NULL, '8'||dg, NULL, '8'||dg
      |FROM d WHERE doc_id%7=0
      |ORDER BY ord""".stripMargin) { (s, d) =>
    import s.implicits._
    val msgs = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val f = "p" + (id % 3)
        val base = id * 100
        def m(seq: Long, ack: Long, req: Boolean, frame: Long,
            msisdn: String, imsi: String) =
          (f, if (req) "a" else "b", if (req) "b" else "a",
            if (req) 1000 else 80, if (req) 80 else 1000,
            seq, ack, req, frame, frame.toString, msisdn, imsi)
        val reqRow = m(base, base + 50, req = true, base, "52" + dg, "")
        // same slot (ack), later frame → D4 must drop it
        val dupReq = m(base + 7, base + 50, req = true, base + 7, "99" + dg, "")
        val resRow = m(base + 50, base + 20, req = false, base + 50, "", "7" + dg)
        val orphan = m(base + 77, 0, req = false, base + 60, "", "8" + dg)
        Seq(reqRow) ++
          (if (id % 5 != 0) Seq(resRow) else Nil) ++
          (if (id % 6 == 0) Seq(dupReq) else Nil) ++
          (if (id % 7 == 0) Seq(orphan) else Nil)
      }
      .toDF("pcapFilename", "srcIp", "dstIp", "srcPort", "dstPort",
        "tcpSequence", "tcpAcknowledge", "httpIsRequest", "firstFrame",
        "framesList", "msisdnOrig", "imsi")
    HttpSs7.pairAndEnrich(msgs, Seq("msisdnOrig", "imsi"))
      .select(coalesce(col("q_frame"), col("r_frame")).as("ord"),
        col("matched"), col("link_state"),
        col("q_msisdnOrig").as("q_msisdn_orig"), col("q_imsi"),
        col("r_msisdnOrig").as("r_msisdn_orig"), col("r_imsi"))
      .orderBy(col("ord"))
  }

  val all: Seq[Q] = Seq(q32GtpEnrich, q33SmppPropagate, q34SccpSegments, q35PairEnrich)
}
