package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{Diameter, Http, HttpMsg, Packet, Packets, Sigshark, Sip, Smpp, TcapPkt}
import graft.functions.CodecExpressions
import graft.operators.Stateful

/** Oracle-checked exercises of the binary-protocol state machines and
  * codecs that previously had ScalaTest coverage only (round-2 verdict
  * "What's missing" #1): each query synthesizes deterministic inputs from
  * `documents.doc_id`, runs the REAL operator (the same code the pcap
  * pipelines call), and declares a DuckDB oracle that computes the
  * expected output closed-form from the generating parameters — an
  * independent implementation sharing no code with the machine under
  * test. Follows the q21/q22 pattern (`XmlExtract.scala`).
  *
  * All synthesized payloads are ASCII/byte-deterministic so the
  * hash-compare is exact; every query ends in the same ORDER BY on both
  * sides (oracle-parity rules).
  */
object Protocol {

  /** Big-endian u32. */
  private def u32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  // ---------------------------------------------------------------------
  // q23: R1/R2 stash-and-prepend reassembly (`diameter.py:274-287`) with
  // greedy multi-emit and F20 frames_list accumulation. Two framed
  // Diameter messages are concatenated and split into three pieces so
  // message 1 spans pieces 1-2 and message 2 spans 2-3; the machine must
  // emit both with the reference's frames_list semantics (frames
  // accumulate until the buffer fully drains).
  // ---------------------------------------------------------------------

  /** 20-byte Diameter header (ver=1, 24-bit length) + ASCII body. */
  private def diamFramed(body: String): Array[Byte] = {
    val bb = body.getBytes("UTF-8")
    val len = 20 + bb.length
    val h = new Array[Byte](20)
    h(0) = 1
    h(1) = ((len >> 16) & 0xff).toByte
    h(2) = ((len >> 8) & 0xff).toByte
    h(3) = (len & 0xff).toByte
    h ++ bb
  }

  val q23Reassemble: Q = Q(
    "q23_reassemble",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg FROM documents)
      |SELECT doc_id, 1 AS msg_no, '1 2' AS frames_list, 'A'||dg||dg||dg AS body FROM d
      |UNION ALL
      |SELECT doc_id, 2 AS msg_no, '1 2 3' AS frames_list, 'B'||dg||dg AS body FROM d
      |ORDER BY doc_id, msg_no""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val body1 = "A" + dg * 3
        val body2 = "B" + dg * 2
        val stream = diamFramed(body1) ++ diamFramed(body2)
        val len1 = 20 + body1.length
        // piece 1 ends 5 bytes short of message 1; piece 2 carries the
        // tail of message 1 plus the first 5 bytes of message 2
        val cuts = Seq((0, len1 - 5), (len1 - 5, len1 + 5), (len1 + 5, stream.length))
        val pieces = cuts.zipWithIndex.map { case ((a, b), i) =>
          Stateful.Piece(i + 1L, id, 0, "s", "d", "f",
            java.util.Arrays.copyOfRange(stream, a, b))
        }
        Stateful.reassemble(pieces, Diameter.expectedLength).zipWithIndex.map {
          case (m, i) =>
            (id, i + 1, m.framesList,
              new String(m.payload, 20, m.payload.length - 20, "UTF-8"))
        }
      }
      .toDF("doc_id", "msg_no", "frames_list", "body")
      .orderBy("doc_id", "msg_no")
  }

  // ---------------------------------------------------------------------
  // q24: F21 AVP walk (grouped-AVP descent 297→298 and 443→450/444),
  // F5 24-bit header fields, F6 NAI→IMSI, vendor-bit 12-byte headers,
  // P7 request-flag split (`diameter.py:112-208`).
  // ---------------------------------------------------------------------

  /** Test-local AVP encoder (independent of the decoder under test). */
  private def avp(code: Int, data: Array[Byte], vendor: Boolean = false): Array[Byte] = {
    val hdr = if (vendor) 12 else 8
    val len = hdr + data.length
    val out = new Array[Byte](((len + 3) / 4) * 4)
    out(0) = (code >> 24).toByte; out(1) = (code >> 16).toByte
    out(2) = (code >> 8).toByte; out(3) = code.toByte
    out(4) = (if (vendor) 0xc0 else 0x40).toByte
    out(5) = ((len >> 16) & 0xff).toByte
    out(6) = ((len >> 8) & 0xff).toByte
    out(7) = (len & 0xff).toByte
    if (vendor) { out(10) = 0x28; out(11) = 0xaf.toByte } // vendor-id 10415
    System.arraycopy(data, 0, out, hdr, data.length)
    out
  }

  val q24DiameterAvp: Q = Q(
    "q24_diameter_avp",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg, doc_id%5 AS m FROM documents)
      |SELECT doc_id, doc_id%2=0 AS request, CAST(272+doc_id%3 AS INTEGER) AS command_code,
      |  doc_id AS hop_by_hop, doc_id*2+1 AS end_to_end,
      |  'sess;'||dg AS session_id, 'oh.'||dg AS origin_host, 'or.'||dg AS origin_realm,
      |  'dh.'||dg AS dest_host, 'dr.'||dg AS dest_realm,
      |  CASE WHEN m=0 THEN 2000+doc_id%10 END AS result_code,
      |  CASE WHEN m=1 THEN 5000+doc_id%10 END AS exp_result_code,
      |  CASE WHEN m=2 THEN '52'||dg ELSE '' END AS msisdn,
      |  CASE WHEN m=3 THEN '7'||dg WHEN m=4 THEN substr(repeat(dg,20),1,15) ELSE '' END AS imsi
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val dg = (id * 7919).toString
        val m = (id % 5).toInt
        def str(s0: String) = s0.getBytes("UTF-8")
        var avps =
          avp(263, str("sess;" + dg)) ++ avp(264, str("oh." + dg)) ++
            avp(296, str("or." + dg)) ++ avp(293, str("dh." + dg)) ++
            avp(283, str("dr." + dg), vendor = true) // 12-byte vendor header
        m match {
          case 0 => avps ++= avp(268, u32(2000 + id % 10))
          case 1 => avps ++= avp(297, avp(298, u32(5000 + id % 10)))
          case 2 => avps ++= avp(443, avp(450, u32(0)) ++ avp(444, str("52" + dg)))
          case 3 => avps ++= avp(443, avp(450, u32(1)) ++ avp(444, str("7" + dg)))
          case _ => avps ++= avp(1, str((dg * 20).take(15) + "@ex.com"))
        }
        val len = 20 + avps.length
        val hdr = new Array[Byte](20)
        hdr(0) = 1
        hdr(1) = ((len >> 16) & 0xff).toByte
        hdr(2) = ((len >> 8) & 0xff).toByte
        hdr(3) = (len & 0xff).toByte
        hdr(4) = (if (id % 2 == 0) 0x80 else 0x00).toByte
        val cmd = 272 + (id % 3).toInt
        hdr(5) = ((cmd >> 16) & 0xff).toByte
        hdr(6) = ((cmd >> 8) & 0xff).toByte
        hdr(7) = (cmd & 0xff).toByte
        System.arraycopy(u32(4L), 0, hdr, 8, 4)
        System.arraycopy(u32(id), 0, hdr, 12, 4)
        System.arraycopy(u32(id * 2 + 1), 0, hdr, 16, 4)
        val msg = Diameter.decode(hdr ++ avps).get
        (id, msg.request, msg.commandCode, msg.hopByHopId, msg.endToEndId,
          msg.sessionId, msg.originHost, msg.originRealm, msg.destinationHost,
          msg.destinationRealm, msg.resultCode, msg.expResultCode, msg.msisdn, msg.imsi)
      }
      .toDF("doc_id", "request", "command_code", "hop_by_hop", "end_to_end",
        "session_id", "origin_host", "origin_realm", "dest_host", "dest_realm",
        "result_code", "exp_result_code", "msisdn", "imsi")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // q25: F1 TBCD + F2 BCD-swap through the CODEGEN'D Catalyst expressions
  // (`CodecExpressions`), input bytes = md5 of a doc-derived string so the
  // 0xF-filler early-termination (TBCD) vs trailing-f strip (BCD) paths
  // both fire on real data. Oracle reimplements the nibble swap with
  // DuckDB list functions — no shared code.
  // ---------------------------------------------------------------------

  val q25Codecs: Q = Q(
    "q25_codecs",
    """WITH d AS (SELECT doc_id, md5(CAST(doc_id*7919 AS VARCHAR)) AS h FROM documents),
      |s AS (SELECT doc_id, list_aggregate(list_transform(range(16),
      |        i -> substr(h, CAST(2*i+2 AS INTEGER), 1) || substr(h, CAST(2*i+1 AS INTEGER), 1)),
      |      'string_agg', '') AS sw FROM d)
      |SELECT doc_id,
      |  CASE WHEN strpos(sw, 'f') > 0 THEN substr(sw, 1, strpos(sw, 'f') - 1) ELSE sw END AS tbcd,
      |  rtrim(sw, 'f') AS bcd
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        unhex(md5((col("doc_id") * 7919).cast("string").cast("binary"))).as("bytes"))
      .select(col("doc_id"),
        CodecExpressions.tbcd_decode(col("bytes")).as("tbcd"),
        CodecExpressions.bcd_swap(col("bytes")).as("bcd"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // q26: J7 TCAP transaction machine (`sigshark.py:458-520`) — four
  // scenarios per session quad: (0) begin/continue/continue/end closing
  // directly on the begin key; (1) begin/continue/abort closing through
  // the bidirectional tid-alias map; (2) orphan continue + orphan end,
  // both dropped; (3) begin never closed, dropped at EOF (keepPartial
  // false). Runs the identical executor-side flatMapGroups machine the
  // pcap path uses (Sigshark.sessionize).
  // ---------------------------------------------------------------------

  val q26TcapSessions: Q = Q(
    "q26_tcap_sessions",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      |s AS (SELECT DISTINCT doc_id//4 AS sess FROM documents)
      |SELECT '6_ga'||CAST(sess AS VARCHAR)||'_'||CAST(sess*10+1 AS VARCHAR) AS key,
      |  sess AS start_ts, CAST(0 AS INTEGER) AS start_usec,
      |  CASE WHEN sess%4=0
      |    THEN CAST(4*sess AS VARCHAR)||' '||CAST(4*sess+1 AS VARCHAR)||' '||CAST(4*sess+2 AS VARCHAR)||' '||CAST(4*sess+3 AS VARCHAR)
      |    ELSE CAST(4*sess AS VARCHAR)||' '||CAST(4*sess+1 AS VARCHAR)||' '||CAST(4*sess+2 AS VARCHAR) END AS frames_list
      |FROM s, mx
      |WHERE (sess%4=0 AND 4*sess+3<=m) OR (sess%4=1 AND 4*sess+2<=m)
      |ORDER BY key""".stripMargin) { (s, d) =>
    import s.implicits._
    val pkts = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val sess = id / 4
        val step = (id % 4).toInt
        val sc = (sess % 4).toInt
        val file = "f" + (sess % 5)
        val otA = sess * 10 + 1
        val otB = sess * 10 + 2
        val gA = "ga" + sess
        val gB = "gb" + sess
        def pkt(mt: String, cgS: Int, cgG: String, ot: Long,
            cdS: Int, cdG: String, dt: Long) =
          TcapPkt(file, id, sess, step, mt, ot, dt, cgS, cgG, cdS, cdG)
        (sc, step) match {
          case (0, 0) => Some(pkt("begin", 6, gA, otA, 8, gB, -1L))
          case (0, 1) => Some(pkt("continue", 8, gB, otB, 6, gA, otA))
          case (0, 2) => Some(pkt("continue", 6, gA, otA, 8, gB, otB))
          case (0, 3) => Some(pkt("end", 8, gB, otB, 6, gA, otA))
          case (1, 0) => Some(pkt("begin", 6, gA, otA, 8, gB, -1L))
          case (1, 1) => Some(pkt("continue", 8, gB, otB, 6, gA, otA))
          case (1, 2) => Some(pkt("abort", 6, gA, otA, 8, gB, otB))
          case (2, 0) => Some(pkt("continue", 8, gB, otB, 6, gA, otA)) // orphan
          case (2, 1) => Some(pkt("end", 8, gB, otB, 6, gA, otA)) // orphan
          case (3, 0) => Some(pkt("begin", 6, gA, otA, 8, gB, -1L)) // never closed
          case _ => None
        }
      }
    Sigshark.sessionize(pkts)
      .map(t => (t.key, t.startTsSec, t.startUsec, t.frames.mkString(" ")))
      .toDF("key", "start_ts", "start_usec", "frames_list")
      .orderBy("key")
  }

  // ---------------------------------------------------------------------
  // q27: R8 length-prefixed SMPP framing (multi-PDU segment + truncated
  // tail) → F24 PDU decode with the P16 command whitelist
  // (`smpp_ingestor.py:109-158`). doc_id%7 cycles the middle PDU through
  // all six whitelisted commands plus enquire_link (dropped).
  // ---------------------------------------------------------------------

  val q27Smpp: Q = Q(
    "q27_smpp",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg, CAST(doc_id%7 AS INTEGER) AS m FROM documents),
      |r AS (
      |  SELECT doc_id, 'submit_sm' AS name, doc_id AS seq, CAST(0 AS BIGINT) AS status,
      |         '52'||dg AS src, '1'||dg AS dst FROM d
      |  UNION ALL
      |  SELECT doc_id,
      |    CASE m WHEN 0 THEN 'submit_sm' WHEN 1 THEN 'deliver_sm' WHEN 2 THEN 'data_sm'
      |           WHEN 3 THEN 'submit_sm_resp' WHEN 4 THEN 'deliver_sm_resp' ELSE 'data_sm_resp' END,
      |    doc_id+1, doc_id%3,
      |    CASE WHEN m<3 THEN '9'||dg ELSE '' END,
      |    CASE WHEN m<3 THEN '8'||dg ELSE '' END
      |  FROM d WHERE m<6
      |  UNION ALL
      |  SELECT doc_id, 'submit_sm_resp', doc_id, doc_id%5, '', '' FROM d)
      |SELECT doc_id, name AS command_name, seq AS sequence_number, status AS command_status,
      |  src AS source_addr, dst AS destination_addr
      |FROM r ORDER BY doc_id, sequence_number, command_name""".stripMargin) { (s, d) =>
    import s.implicits._
    // requests first, then the _resp variants, then non-whitelisted
    val cmds = Vector(4L, 5L, 0x103L, 0x80000004L, 0x80000005L, 0x80000103L, 0x15L)
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val m = (id % 7).toInt
        def reqBody(src: String, dst: String): Array[Byte] =
          Array[Byte](0, 0, 0) ++ src.getBytes("UTF-8") ++ Array[Byte](0, 0, 0) ++
            dst.getBytes("UTF-8") ++ Array[Byte](0)
        def pdu(cmd: Long, status: Long, seq: Long, body: Array[Byte]): Array[Byte] =
          u32(16L + body.length) ++ u32(cmd) ++ u32(status) ++ u32(seq) ++ body
        val mid = cmds(m)
        val midBody =
          if (m < 3) reqBody("9" + dg, "8" + dg) else Array.emptyByteArray
        val stream =
          pdu(4L, 0, id, reqBody("52" + dg, "1" + dg)) ++
            pdu(mid, id % 3, id + 1, midBody) ++
            pdu(0x80000004L, id % 5, id, Array.emptyByteArray) ++
            Array[Byte](0, 0, 0, 100, 1, 2, 3) // truncated tail → clean stop
        Smpp.framePdus(stream).flatMap(Smpp.decodePdu).map { p =>
          (id, p.commandName, p.sequenceNumber, p.commandStatus,
            p.sourceAddr, p.destinationAddr)
        }
      }
      .toDF("doc_id", "command_name", "sequence_number", "command_status",
        "source_addr", "destination_addr")
      .orderBy("doc_id", "sequence_number", "command_name")
  }

  // ---------------------------------------------------------------------
  // q28: R5 IPv4 fragment reassembly (`sip_ingestor.py:163-184`) through
  // the real (file, src, dst, ipId)-keyed flatMapGroups shuffle: two
  // datagrams per key (3 fragments of `text`, then 2 fragments of
  // `text||text`), MF flag clearing on the last fragment of each.
  // ---------------------------------------------------------------------

  val q28IpDefrag: Q = Q(
    "q28_ip_defrag",
    """SELECT doc_id, '10 11 12' AS frames_list, text AS body FROM documents
      |UNION ALL
      |SELECT doc_id, '13 14' AS frames_list, text||text AS body FROM documents
      |ORDER BY doc_id, frames_list""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val b1 = text.getBytes("UTF-8")
        val n = b1.length
        val b2 = b1 ++ b1 // text||text — byte-identical in both engines
        def part(b: Array[Byte], a: Int, z: Int) = java.util.Arrays.copyOfRange(b, a, z)
        def p(frame: Long, mf: Boolean, payload: Array[Byte]) =
          Packet("f", frame, id, 0, "a", "b", (id % 65535).toInt, mf,
            Packets.ProtoUdp, 1, 2, 0L, 0L, 0, payload)
        Seq(
          p(10, mf = true, part(b1, 0, n / 3)),
          p(11, mf = true, part(b1, n / 3, 2 * n / 3)),
          p(12, mf = false, part(b1, 2 * n / 3, n)),
          p(13, mf = true, part(b2, 0, n + n / 3)),
          p(14, mf = false, part(b2, n + n / 3, 2 * n)))
      }
      .groupByKey(p => (p.pcapFilename, p.srcIp, p.dstIp, p.ipId))
      .flatMapGroups { (_, it) =>
        Sip.defragment(it.toSeq).iterator.map { case (fl, first, buf) =>
          (first.tsSec, fl, new String(buf, "UTF-8"))
        }
      }
      .toDF("doc_id", "frames_list", "body")
      .orderBy("doc_id", "frames_list")
  }

  // ---------------------------------------------------------------------
  // q29: J4 request→response linking (engine-side row_number ids,
  // last-response-wins `max(id)` per reverse 4-tuple). doc_id%7==0 rows
  // have no response (null link), doc_id%3==0 have two (the LAST one's id
  // must win), the rest exactly one.
  // ---------------------------------------------------------------------

  val q29HttpLink: Q = Q(
    "q29_http_link",
    """WITH d AS (SELECT doc_id, 'h'||CAST(doc_id%4 AS VARCHAR) AS f,
      |    CASE WHEN doc_id%7=0 THEN 0 WHEN doc_id%3=0 THEN 2 ELSE 1 END AS nres FROM documents),
      |m AS (
      |  SELECT doc_id, f, doc_id*10 AS ff, true AS req, nres FROM d
      |  UNION ALL SELECT doc_id, f, doc_id*10+5, false, nres FROM d WHERE nres>=1
      |  UNION ALL SELECT doc_id, f, doc_id*10+7, false, nres FROM d WHERE nres>=2),
      |w AS (SELECT *, row_number() OVER (PARTITION BY f ORDER BY ff) AS id FROM m)
      |SELECT f AS pcap_filename, ff AS first_frame, req AS http_is_request, id,
      |  CASE WHEN req AND nres>0 THEN id+nres END AS http_response_in
      |FROM w ORDER BY pcap_filename, first_frame""".stripMargin) { (s, d) =>
    import s.implicits._
    val msgs = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val file = "h" + (id % 4)
        def m(ff: Long, req: Boolean, sIp: String, sPort: Int, dIp: String, dPort: Int) =
          HttpMsg(ff.toString, ff, 0L, 0, sIp, dIp, file, sPort, dPort, ff, 0L,
            req, if (req) "GET" else "", "u", if (req) None else Some(200),
            "", None, "noContent", "")
        val nres = if (id % 7 == 0) 0 else if (id % 3 == 0) 2 else 1
        m(id * 10, req = true, "c", id.toInt, "s", 80) +:
          (0 until nres).map(k => m(id * 10 + 5 + 2 * k, req = false, "s", 80, "c", id.toInt))
      }
      .toDF()
    Http.link(msgs)
      .select(col("pcapFilename").as("pcap_filename"),
        col("firstFrame").as("first_frame"),
        col("httpIsRequest").as("http_is_request"),
        col("id"), col("http_response_in"))
      .orderBy("pcap_filename", "first_frame")
  }

  // ---------------------------------------------------------------------
  // q30: F26/F27 targeted TCAP BER parse — message-type dispatch,
  // otid/dtid extraction, the begin/continue-vs-end/abort tid rule,
  // component typing (invoke/returnResultLast/returnError), second-INTEGER
  // opcode/error-code slot, and the F2/F3 BCD heuristics on the first
  // OCTET STRING (`gsm_map.py:28-54,312-347`).
  // ---------------------------------------------------------------------

  /** Test-local short-form BER TLV encoder. */
  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    Array(tag.toByte, content.length.toByte) ++ content

  val q30TcapParse: Q = Q(
    "q30_tcap_parse",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg, CAST(doc_id%4 AS INTEGER) AS m FROM documents),
      |e AS (SELECT doc_id, m, substr(repeat(dg,16),1,16) AS d16 FROM d)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN 'begin' WHEN 1 THEN 'continue' WHEN 2 THEN 'end' ELSE 'abort' END AS mess_type,
      |  CASE WHEN m<=1 THEN doc_id ELSE -1 END AS otid,
      |  CASE WHEN m>=1 THEN doc_id+1 ELSE -1 END AS dtid,
      |  CASE WHEN m<=1 THEN doc_id ELSE doc_id+1 END AS tcap_tid,
      |  CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE -1 END AS INTEGER) AS component,
      |  CAST(CASE WHEN m<=1 THEN 45+doc_id%5 ELSE -1 END AS INTEGER) AS op_code,
      |  CAST(CASE WHEN m=2 THEN 34+doc_id%3 ELSE -1 END AS INTEGER) AS err_code,
      |  CASE WHEN m=0 THEN d16 ELSE '' END AS imsi,
      |  CASE WHEN m=0 THEN substr(d16,3) ELSE '' END AS msisdn
      |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val dg = (id * 7919).toString
        val m = (id % 4).toInt
        val d16 = (dg * 16).take(16)
        // pack digit pairs so bcd_swap emits d16 verbatim: byte i =
        // (digit(2i+1) << 4) | digit(2i)
        val ostr = d16.grouped(2).map { p =>
          (((p(1) - '0') << 4) | (p(0) - '0')).toByte
        }.toArray
        val otid = tlv(0x48, u32(id))
        val dtid = tlv(0x49, u32(id + 1))
        val invokeId = tlv(0x02, Array[Byte](1))
        val content = m match {
          case 0 =>
            val comp = tlv(0xa1, invokeId ++ tlv(0x02, Array((45 + id % 5).toByte)) ++
              tlv(0x30, tlv(0x04, ostr)))
            (0x62, otid ++ tlv(0x6c, comp))
          case 1 =>
            val comp = tlv(0xa2, invokeId ++ tlv(0x02, Array((45 + id % 5).toByte)))
            (0x65, otid ++ dtid ++ tlv(0x6c, comp))
          case 2 =>
            val comp = tlv(0xa3, invokeId ++ tlv(0x02, Array((34 + id % 3).toByte)))
            (0x64, dtid ++ tlv(0x6c, comp))
          case _ =>
            (0x67, dtid)
        }
        val msg = graft.etl.GsmMap.tcapParse(tlv(content._1, content._2)).get
        (id, msg.messType, msg.otid, msg.dtid, msg.tcapTid, msg.gsmComponent,
          msg.gsmOpCode, msg.gsmErrorCode, msg.imsi, msg.msisdn)
      }
      .toDF("doc_id", "mess_type", "otid", "dtid", "tcap_tid", "component",
        "op_code", "err_code", "imsi", "msisdn")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // q31: SIP parse — P12 method whitelist (bogus first token dropped),
  // F7 user extraction from From/To, F8 13-digit MSISDN normalization,
  // F25 SDP owner line, response status-code branch
  // (`sip_ingestor.py:31-40,215-254`).
  // ---------------------------------------------------------------------

  val q31SipParse: Q = Q(
    "q31_sip_parse",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg, CAST(doc_id%10 AS INTEGER) AS k FROM documents)
      |SELECT doc_id,
      |  CASE k WHEN 0 THEN 'ACK' WHEN 1 THEN 'BYE' WHEN 2 THEN 'CANCEL' WHEN 3 THEN 'INFO'
      |         WHEN 4 THEN 'INVITE' WHEN 5 THEN 'PRACK' WHEN 6 THEN 'REGISTER' WHEN 7 THEN 'UPDATE'
      |         ELSE '' END AS method,
      |  CASE WHEN k=8 THEN 200 END AS status_code,
      |  'cid-'||dg AS call_id,
      |  CASE WHEN doc_id%2=0 THEN substr(substr(repeat(dg,13),1,13),5) ELSE 'u_'||dg END AS from_user,
      |  CASE WHEN doc_id%2=0 THEN substr(repeat(dg,13),1,13) ELSE 'u_'||dg END AS from_original,
      |  '52'||dg AS to_user,
      |  dg AS sdp_id, CAST(doc_id%100 AS VARCHAR) AS sdp_ver
      |FROM d WHERE k<9 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val methods = Vector("ACK", "BYE", "CANCEL", "INFO", "INVITE", "PRACK",
      "REGISTER", "UPDATE")
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val k = (id % 10).toInt
        val firstLine =
          if (k < 8) methods(k) + " sip:svc@x SIP/2.0"
          else if (k == 8) "SIP/2.0 200 OK"
          else "FOO sip:x SIP/2.0" // P12: dropped
        val fromRaw =
          if (id % 2 == 0) (dg * 13).take(13) else "u_" + dg
        val text = firstLine +
          "\r\nFrom: <sip:" + fromRaw + ">;tag=1" +
          "\r\nTo: <tel:+52" + dg + ">" +
          "\r\nCall-ID: cid-" + dg +
          "\r\n\r\nv=0\r\no=alice " + dg + " " + (id % 100) + " IN IP4 h\r\n"
        Sip.parse("1", 1L, id, 0, "a", "b", "f", text).map { sm =>
          (id, sm.method, sm.statusCode, sm.callId, sm.fromUser,
            sm.fromOriginal, sm.toUser, sm.sdpOSessionId, sm.sdpOVersion)
        }
      }
      .toDF("doc_id", "method", "status_code", "call_id", "from_user",
        "from_original", "to_user", "sdp_id", "sdp_ver")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q23Reassemble, q24DiameterAvp, q25Codecs,
    q26TcapSessions, q27Smpp, q28IpDefrag, q29HttpLink, q30TcapParse,
    q31SipParse)
}
