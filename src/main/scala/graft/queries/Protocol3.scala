package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{Http, Packets, Sip}
import graft.operators.Stateful.Piece
import graft.sources.{Frame, Pcap}

/** Third batch of synthesize-input oracle queries: HTTP flow reassembly
  * and parse (R3/D2/F9/F10/F28), SIP cross-leg correlation (J6), the
  * L3/L4 packet decoder incl. ip-in-ip and SCTP chunk explode
  * (P2/P3/P8/R7/F23), and the pcap/pcapng byte readers themselves
  * (S1/S2/S3/F16). Byte builders are test-local encoders, independent of
  * the decoders under test.
  */
object Protocol3 {

  // ---------------------------------------------------------------------
  // q36: R3 flow reassembly (continuation append + D2 retransmission
  // drop + greedy multi-message) feeding the real parse — F9 headers,
  // F10 URI synthesis with the reference's trailing space, F28
  // body-status typing (content / noContent / httpIncomplete).
  // ---------------------------------------------------------------------

  val q36HttpFlow: Q = Q(
    "q36_http_flow",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg,
      |            CAST(doc_id%3 AS INTEGER) AS m FROM documents)
      |SELECT doc_id, doc_id*10 AS first_frame, '1 2' AS frames_list, 'POST' AS method,
      |  'http://s:8080/p'||dg||' ' AS uri, 'text/xml' AS content_type,
      |  CAST(length(dg)+7 AS INTEGER) AS content_length,
      |  'content' AS body_type, '<a>'||dg||'</a>' AS body
      |FROM d
      |UNION ALL
      |SELECT doc_id, doc_id*10+3, '4',
      |  CASE m WHEN 0 THEN 'GET' WHEN 1 THEN 'POST' ELSE 'PUT' END,
      |  CASE m WHEN 0 THEN 'http://s:8080/q ' WHEN 1 THEN 'http://s:8080/r ' ELSE 'http://s:8080/s ' END,
      |  '',
      |  CASE WHEN m=1 THEN 5 WHEN m=2 THEN 2 END,
      |  CASE m WHEN 0 THEN 'noContent' WHEN 1 THEN 'httpIncomplete' ELSE 'content' END,
      |  CASE WHEN m=2 THEN 'ok' ELSE '' END
      |FROM d
      |ORDER BY doc_id, first_frame""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val dg = (id * 7919).toString
        val m = (id % 3).toInt
        val body1 = s"<a>$dg</a>"
        def seg(frame: Long, seq: Long, ack: Long, text: String) =
          (Piece(frame, id, 0, "c", "s", "f", text.getBytes("UTF-8")), seq, ack)
        val msg2 = m match {
          case 0 => "GET /q HTTP/1.1\r\n\r\n"
          case 1 => "POST /r HTTP/1.1\r\nContent-Length: 5\r\n\r\n"
          case _ => "PUT /s HTTP/1.1\r\nContent-Length: 2\r\n\r\nok"
        }
        val base = id * 10
        val segs = Seq(
          seg(base, 10, 20, s"POST /p$dg HTTP/1.1\r\nContent-Type: text/xml\r\n" +
            s"Content-Length: ${body1.length}\r\n\r\n<a>"),
          seg(base + 1, 11, 20, dg + "</a>"), // continuation
          seg(base + 2, 11, 20, dg + "</a>"), // D2: same (seq, ack) → dropped
          seg(base + 3, 12, 21, msg2))
        Http.reassembleFlow(segs, srcPort = 1234, dstPort = 8080).map { hm =>
          // frames_list relative to the doc's base for a closed-form oracle
          (id, hm.firstFrame, hm.framesList.split(" ")
            .map(f => (f.toLong - base + 1).toString).mkString(" "),
            hm.method, hm.uri, hm.contentType, hm.contentLength,
            hm.bodyType, hm.body)
        }
      }
      .toDF("doc_id", "first_frame", "frames_list", "method", "uri",
        "content_type", "content_length", "body_type", "body")
      .orderBy(col("doc_id"), col("first_frame"))
  }

  // ---------------------------------------------------------------------
  // q37: J6 cross-leg correlation — leg-B rows take canonical from/to
  // users from the first leg-A row sharing the SDP owner key; rows with
  // no SDP key, no canonical, or an unclassified source IP keep their
  // own users (`sip_ingestor.py:332-433`).
  // ---------------------------------------------------------------------

  val q37SipCrossleg: Q = Q(
    "q37_sip_crossleg",
    """WITH d AS (SELECT doc_id, doc_id//2 AS s, CAST(doc_id%2 AS INTEGER) AS role FROM documents)
      |SELECT doc_id, s*10 AS first_frame, 'fa'||CAST(s AS VARCHAR) AS from_user, 'ta'||CAST(s AS VARCHAR) AS to_user
      |FROM d WHERE role=0 AND s%7<>0
      |UNION ALL
      |SELECT doc_id, s*10+1,
      |  CASE WHEN doc_id%11<>0 AND s%5<>0 AND s%7<>0 THEN 'fa'||CAST(s AS VARCHAR) ELSE 'fb'||CAST(s AS VARCHAR) END,
      |  CASE WHEN doc_id%11<>0 AND s%5<>0 AND s%7<>0 THEN 'ta'||CAST(s AS VARCHAR) ELSE 'tb'||CAST(s AS VARCHAR) END
      |FROM d WHERE role=1
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val msgs = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val sess = id / 2
        val role = (id % 2).toInt
        if (role == 0) {
          if (sess % 7 == 0) None // no canonical for these sessions
          else Some((id, "1.1.1.1", sess * 10, "fa" + sess, "ta" + sess,
            "sd" + sess, "v1"))
        } else {
          val ip = if (id % 11 == 0) "9.9.9.9" else "2.2.2.2"
          val sdp = if (sess % 5 == 0) "" else "sd" + sess
          Some((id, ip, sess * 10 + 1, "fb" + sess, "tb" + sess, sdp, "v1"))
        }
      }
      .toDF("doc_id", "srcIp", "firstFrame", "fromUser", "toUser",
        "sdpOSessionId", "sdpOVersion")
    Sip.crossLegCorrelate(msgs, legAIps = Set("1.1.1.1"), legBIps = Set("2.2.2.2"))
      .select(col("doc_id"), col("firstFrame").as("first_frame"),
        col("fromUser").as("from_user"), col("toUser").as("to_user"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q38: P2/P3 L3/L4 decode, F23 ip-in-ip unwrap, P8/R7 SCTP chunk
  // explode — real Packets.decode/sctpChunks over test-locally encoded
  // ether/ipv4/l4 byte frames.
  // ---------------------------------------------------------------------

  private def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def enc(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  private def encIpv4(proto: Int, payload: Array[Byte]): Array[Byte] =
    enc(Array[Byte](0x45, 0), be16(20 + payload.length), be16(7), Array[Byte](0, 0),
      Array[Byte](64, proto.toByte), be16(0),
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2), payload)

  private def encEther(p: Array[Byte]): Array[Byte] =
    enc(new Array[Byte](12), be16(0x0800), p)

  private def encTcp(sp: Int, dp: Int, seq: Long, ack: Long, flags: Int,
      payload: Array[Byte]): Array[Byte] =
    enc(be16(sp), be16(dp), be32(seq), be32(ack),
      Array[Byte]((5 << 4).toByte, flags.toByte), be16(0), be16(0), be16(0), payload)

  private def encUdp(sp: Int, dp: Int, payload: Array[Byte]): Array[Byte] =
    enc(be16(sp), be16(dp), be16(8 + payload.length), be16(0), payload)

  private def encSctpData(streamId: Int, streamSeq: Int, ppid: Long,
      payload: Array[Byte]): Array[Byte] = {
    val len = 16 + payload.length
    val pad = (4 - len % 4) % 4
    enc(Array[Byte](0, 0), be16(len), be32(1), be16(streamId), be16(streamSeq),
      be32(ppid), payload, new Array[Byte](pad))
  }

  val q38PacketDecode: Q = Q(
    "q38_packet_decode",
    """WITH d AS (SELECT doc_id, CAST(doc_id%4 AS INTEGER) AS m,
      |            CAST(doc_id%5 AS INTEGER) AS k FROM documents)
      |SELECT doc_id, '10.0.0.1' AS src_ip,
      |  CAST(CASE m WHEN 1 THEN 17 WHEN 2 THEN 132 ELSE 6 END AS INTEGER) AS ip_proto,
      |  CAST(CASE m WHEN 1 THEN 2222 WHEN 2 THEN 4444 ELSE 1111 END AS INTEGER) AS src_port,
      |  CAST(CASE m WHEN 1 THEN 3333 WHEN 2 THEN 5555 ELSE 80 END AS INTEGER) AS dst_port,
      |  CASE WHEN m IN (0, 3) THEN doc_id ELSE 0 END AS tcp_seq,
      |  CAST(CASE WHEN m IN (0, 3) THEN 24 ELSE 0 END AS INTEGER) AS tcp_flags,
      |  CAST(CASE m WHEN 2 THEN k+2 ELSE k+1 END AS INTEGER) AS payload_len,
      |  CAST(CASE m WHEN 2 THEN 2 ELSE 0 END AS INTEGER) AS n_chunks,
      |  CAST(CASE WHEN m=2 THEN 46 END AS BIGINT) AS first_ppid
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val m = (id % 4).toInt
        val k = (id % 5).toInt
        val l4 = m match {
          case 0 => encTcp(1111, 80, id, id + 1, 24, Array.fill((k + 1))('T'.toByte))
          case 1 => encUdp(2222, 3333, Array.fill(k + 1)('U'.toByte))
          case 2 => enc(be16(4444), be16(5555), be32(0), be32(0), // SCTP common hdr
            encSctpData(3, 4, 46L, Array.fill(k + 2)('S'.toByte)),
            Array[Byte](1, 0, 0, 8, 0, 0, 0, 0)) // non-DATA chunk
          case _ => encTcp(1111, 80, id, id + 1, 24, Array.fill(k + 1)('T'.toByte))
        }
        val proto = m match { case 1 => 17; case 2 => 132; case _ => 6 }
        val inner = encIpv4(proto, l4)
        // F23: m=3 wraps the IPv4 packet in an outer proto-4 header
        val frameBytes = encEther(if (m == 3) encIpv4(4, inner) else inner)
        val pkt = Packets.decode(Frame("f", 1, id, 0, 1, frameBytes)).get
        val chunks = if (m == 2) Packets.sctpChunks(pkt) else Seq.empty
        val payloadLen =
          if (m == 2) chunks.head.payload.length else pkt.payload.length
        (id, pkt.srcIp, pkt.ipProto, pkt.srcPort, pkt.dstPort, pkt.tcpSeq,
          pkt.tcpFlags, payloadLen, chunks.length,
          if (m == 2) Some(chunks.head.ppid) else None)
      }
      .toDF("doc_id", "src_ip", "ip_proto", "src_port", "dst_port", "tcp_seq",
        "tcp_flags", "payload_len", "n_chunks", "first_ppid")
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q39: the capture readers themselves — S1 magic sniff (LE + BE pcap,
  // pcapng), S2 classic pcap record walk with the F16 µs clamp, S3
  // pcapng SHB/IDB/EPB walk with the reference's decimal-digit timestamp
  // split including the <6-fractional-digit → 0 rule.
  // ---------------------------------------------------------------------

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def encPcap(le: Boolean, dlt: Int,
      frames: Seq[(Long, Long, Array[Byte])]): Array[Byte] = {
    def w32(v: Long) = if (le) le32(v) else be32(v)
    def w16(v: Int) = if (le) le16(v) else be16(v)
    val magic = if (le) Array(0xd4, 0xc3, 0xb2, 0xa1).map(_.toByte)
      else Array(0xa1, 0xb2, 0xc3, 0xd4).map(_.toByte)
    val hdr = enc(magic, w16(2), w16(4), w32(0), w32(0), w32(65535), w32(dlt))
    frames.foldLeft(hdr) { case (acc, (sec, usec, data)) =>
      enc(acc, w32(sec), w32(usec), w32(data.length), w32(data.length), data)
    }
  }

  private def encPcapNg(dlt: Int, frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
    def block(btype: Long, body: Array[Byte]): Array[Byte] = {
      val len = 12 + body.length
      enc(if (btype == 0x0a0d0d0aL) be32(btype) else le32(btype),
        le32(len), body, le32(len))
    }
    val shb = block(0x0a0d0d0aL, enc(le32(0x1a2b3c4dL), le16(1), le16(0),
      Array.fill(8)(0xff.toByte)))
    val idb = block(1L, enc(le16(dlt), le16(0), le32(65535)))
    val epbs = frames.map { case (ts, data) =>
      val pad = (4 - data.length % 4) % 4
      block(6L, enc(le32(0), le32(ts >>> 32), le32(ts & 0xffffffffL),
        le32(data.length), le32(data.length), data, new Array[Byte](pad)))
    }
    enc((shb +: idb +: epbs): _*)
  }

  val q39PcapReaders: Q = Q(
    "q39_pcap_readers",
    """WITH d AS (SELECT doc_id, CAST(doc_id%7+1 AS INTEGER) AS dl FROM documents)
      |SELECT doc_id, 'le' AS fmt, 1 AS frame_no, doc_id AS ts_sec,
      |       123456 AS ts_usec, dl AS data_len, CAST(1 AS INTEGER) AS dlt FROM d
      |UNION ALL
      |SELECT doc_id, 'le', 2, doc_id+1, 99, dl, 1 FROM d
      |UNION ALL
      |SELECT doc_id, 'be', 1, doc_id*2, 7, dl, 141 FROM d
      |UNION ALL
      |SELECT doc_id, 'ng', 1, (1600000000000000+doc_id*1000000+doc_id%999999)//1000000,
      |       CAST((1600000000000000+doc_id*1000000+doc_id%999999)%1000000 AS INTEGER), dl, 141 FROM d
      |UNION ALL
      |SELECT doc_id, 'ng', 2, (1600000000123+doc_id)//1000, 0, dl, 141 FROM d
      |ORDER BY doc_id, fmt, frame_no""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val data = Array.fill((id % 7).toInt + 1)('D'.toByte)
        // F16: 7-digit µs field must clamp to its first 6 digits
        val pcapLe = encPcap(le = true, 1, Seq((id, 1234567L, data), (id + 1, 99L, data)))
        val pcapBe = encPcap(le = false, 141, Seq((id * 2, 7L, data)))
        // 16-digit µs-resolution tick + 13-digit ms-resolution tick (µs→0)
        val ngTs1 = 1600000000000000L + id * 1000000L + id % 999999
        val ngTs2 = 1600000000123L + id
        val ng = encPcapNg(141, Seq((ngTs1, data), (ngTs2, data)))
        Pcap.decodeFile("le", pcapLe).map(f => (id, "le", f)) ++
          Pcap.decodeFile("be", pcapBe).map(f => (id, "be", f)) ++
          Pcap.decodeFile("ng", ng).map(f => (id, "ng", f))
      }
      .map { case (id, fmt, f) =>
        (id, fmt, f.frameNo.toInt, f.tsSec, f.tsUsec, f.data.length, f.dlt)
      }
      .toDF("doc_id", "fmt", "frame_no", "ts_sec", "ts_usec", "data_len", "dlt")
      .orderBy(col("doc_id"), col("fmt"), col("frame_no"))
  }

  // ---------------------------------------------------------------------
  // q40: GTPv1/v2 decode — F17 code→name maps, F22 principled IE walk
  // (TV + TLV v1 forms, 4-byte-header v2 TLVs), F29 >10-digit IMSI gate
  // (a 9-digit TBCD IMSI must be rejected), F1 TBCD with filler nibbles.
  // ---------------------------------------------------------------------

  /** TBCD-encode a digit string into `nbytes` bytes (0xF filler). */
  private def tbcdEnc(digits: String, nbytes: Int): Array[Byte] = {
    val out = Array.fill(nbytes)(0xff.toByte)
    var i = 0
    while (i < digits.length) {
      val nib = digits(i) - '0'
      val b = i / 2
      out(b) =
        (if (i % 2 == 0) (out(b) & 0xf0) | nib else (nib << 4) | (out(b) & 0x0f)).toByte
      i += 1
    }
    out
  }

  val q40GtpDecode: Q = Q(
    "q40_gtp_decode",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg,
      |            CAST(doc_id%4 AS INTEGER) AS m FROM documents),
      |e AS (SELECT doc_id, m, substr(repeat(dg,15),1,15) AS d15,
      |             substr(repeat(dg,12),1,12) AS m12 FROM d)
      |SELECT doc_id,
      |  CASE WHEN m<=1 THEN 'v1' ELSE 'v2' END AS version,
      |  CASE m WHEN 0 THEN 'Create PDP Context Request' WHEN 1 THEN 'Echo Response'
      |         WHEN 2 THEN 'Create Session Request' ELSE 'Echo Request' END AS message,
      |  CASE WHEN m=3 THEN 0 ELSE doc_id END AS teid,
      |  CASE WHEN m IN (0, 2) THEN 'Request accepted' ELSE '' END AS cause,
      |  CASE m WHEN 0 THEN doc_id%65536 WHEN 1 THEN 0 ELSE doc_id END AS seq,
      |  CASE WHEN (m=0 AND doc_id%5<>0) OR m=2 THEN d15 ELSE '' END AS imsi,
      |  CASE WHEN m IN (0, 2) THEN m12 ELSE '' END AS msisdn
      |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val dg = (id * 7919).toString
        val m = (id % 4).toInt
        val d15 = (dg * 15).take(15)
        val d9 = (dg * 9).take(9) // F29: must be rejected (≤10 digits)
        val m12 = (dg * 12).take(12)
        val bytes = m match {
          case 0 =>
            val imsiDigits = if (id % 5 == 0) d9 else d15
            enc(Array[Byte](0x32, 16), be16(0), be32(id), // v1, S flag
              be16((id % 65536).toInt), be16(0), // seq + npdu/next
              Array[Byte](1, 0x80.toByte), // Cause TV
              Array[Byte](2), tbcdEnc(imsiDigits, 8), // IMSI TV
              Array[Byte](0x86.toByte), be16(7), Array[Byte](0x91.toByte),
              tbcdEnc(m12, 6)) // MSISDN TLV (TON/NPI + 6 TBCD bytes)
          case 1 =>
            enc(Array[Byte](0x30, 2), be16(0), be32(id)) // v1 Echo Response
          case 2 =>
            enc(Array[Byte](0x48, 32), be16(0), be32(id), // v2 + TEID
              enc(be16((id >> 8).toInt & 0xff), // seq: 3 bytes then spare
                Array[Byte]((id & 0xff).toByte, 0)),
              Array[Byte](1), be16(8), Array[Byte](0), tbcdEnc(d15, 8), // IMSI
              Array[Byte](2), be16(2), Array[Byte](0, 16, 0), // Cause
              Array[Byte](76), be16(6), Array[Byte](0), tbcdEnc(m12, 6)) // MSISDN
          case _ =>
            enc(Array[Byte](0x40, 1), be16(0), // v2, no TEID
              enc(be16((id >> 8).toInt & 0xff), Array[Byte]((id & 0xff).toByte, 0)))
        }
        val g = graft.etl.Gtp.decode(bytes).get
        (id, g.gtpVersion, g.gtpMessage, g.gtpTeid, g.gtpCause, g.gtpSeqNumber,
          g.imsi, g.msisdn)
      }
      .toDF("doc_id", "version", "message", "teid", "cause", "seq", "imsi", "msisdn")
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q41: S4 DLT dispatch + P1 link-layer IPv4 gate — the same UDP packet
  // behind every supported link type (EN10MB, LINUX_SLL, LINUX_SLL2,
  // NULL, ENC raw-IP), plus an ARP ethertype that must be dropped.
  // ---------------------------------------------------------------------

  val q41DltDispatch: Q = Q(
    "q41_dlt_dispatch",
    """WITH d AS (SELECT doc_id, CAST(doc_id%6 AS INTEGER) AS m,
      |            CAST(doc_id%3+1 AS INTEGER) AS pl FROM documents)
      |SELECT doc_id, '10.0.0.1' AS src_ip, CAST(7777 AS INTEGER) AS src_port,
      |       CAST(8888 AS INTEGER) AS dst_port, pl AS payload_len
      |FROM d WHERE m <> 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val m = (id % 6).toInt
        val ip = encIpv4(17, encUdp(7777, 8888, Array.fill((id % 3).toInt + 1)('P'.toByte)))
        val (dlt, frameBytes) = m match {
          case 0 => (1, encEther(ip))
          case 1 => (1, enc(new Array[Byte](12), be16(0x0806), ip)) // ARP → dropped
          case 2 => (113, enc(new Array[Byte](14), be16(0x0800), ip))
          case 3 => (276, enc(be16(0x0800), new Array[Byte](18), ip))
          case 4 => (0, enc(Array[Byte](2, 0, 0, 0), ip))
          case _ => (109, ip)
        }
        Packets.decode(Frame("f", 1, id, 0, dlt, frameBytes)).map { p =>
          (id, p.srcIp, p.srcPort, p.dstPort, p.payload.length)
        }
      }
      .toDF("doc_id", "src_ip", "src_port", "dst_port", "payload_len")
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q42: the CAMEL/tshark-JSON extraction (S5 parse path) — F15 epoch
  // split, F19 hex→long in both 0x- and colon-separated forms, F17
  // op-name map incl. the unmapped→null case, and the CAMEL F26 tid rule
  // (otid iff initialDP else dtid) — over a synthesized `_source.layers`
  // structure with the dotted tshark field names.
  // ---------------------------------------------------------------------

  val q42Camel: Q = Q(
    "q42_camel",
    """SELECT doc_id AS frame_number, doc_id AS time_epoch,
      |  CAST(doc_id%1000000 AS INTEGER) AS useconds_epoch,
      |  '1.2.3.4' AS src_ip, '5.6.7.8' AS dst_ip,
      |  doc_id AS tcap_otid, doc_id+1 AS tcap_dtid,
      |  CAST(CASE doc_id%3 WHEN 0 THEN 0 WHEN 1 THEN 31 ELSE 99 END AS INTEGER) AS camel_local,
      |  'c.pcap' AS pcap_filename,
      |  CASE doc_id%3 WHEN 0 THEN 'initialDP' WHEN 1 THEN 'continue' END AS camel_op_name,
      |  CASE WHEN doc_id%3=0 THEN doc_id ELSE doc_id+1 END AS tcap_tid
      |FROM documents ORDER BY frame_number""".stripMargin) { (s, d) =>
    val raw = Tables.documents(s, d).select(
      struct(
        struct(
          array(col("doc_id").cast("string")).as("frame.number"),
          array(concat(col("doc_id").cast("string"), lit("."),
            lpad((col("doc_id") % 1000000).cast("string"), 6, "0"))).as("frame.time_epoch"),
          array(lit("1.2.3.4")).as("ip.src"),
          array(lit("5.6.7.8")).as("ip.dst"),
          array(concat(lit("0x"), lower(hex(col("doc_id"))))).as("tcap.otid"),
          array(concat(lit("0:"), lower(hex(col("doc_id") + 1)))).as("tcap.dtid"),
          array(when(col("doc_id") % 3 === 0, "0")
            .when(col("doc_id") % 3 === 1, "31").otherwise("99")).as("camel.local")
        ).as("layers")).as("_source"))
    graft.etl.Camel.extract(raw, "c.pcap")
      .orderBy(col("frame_number"))
  }

  // ---------------------------------------------------------------------
  // q43: F30 protocol-specific XML rules — SMPP commandId routing
  // (5 → sourceAddress, 4 → destAddress, other → none) and the Diameter
  // "null"/empty resultCode → 0 rule — through the real F11 fixup parse
  // (a BARE ampersand in the address must survive the escape/unescape
  // round trip).
  // ---------------------------------------------------------------------

  val q43XmlRules: Q = Q(
    "q43_xml_rules",
    """WITH d AS (SELECT doc_id, CAST(doc_id*7919 AS VARCHAR) AS dg,
      |            CAST(doc_id%5 AS INTEGER) AS m FROM documents)
      |SELECT doc_id,
      |  CASE WHEN m=0 THEN '52&'||dg WHEN m=1 THEN '1'||dg END AS msisdn,
      |  CASE WHEN m=3 THEN 0 WHEN m=4 THEN 2000+doc_id%10 END AS result_code
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val dg = (id * 7919).toString
        val m = (id % 5).toInt
        val body = m match {
          case 0 => s"<submit><commandId>5</commandId><sourceAddress>52&$dg</sourceAddress>" +
            s"<destAddress>x</destAddress></submit>"
          case 1 => s"<submit><commandId>4</commandId><sourceAddress>x</sourceAddress>" +
            s"<destAddress>1$dg</destAddress></submit>"
          case 2 => "<submit><commandId>3</commandId><sourceAddress>x</sourceAddress></submit>"
          case 3 => "<ccr><resultCode>null</resultCode></ccr>"
          case _ => s"<ccr><resultCode>${2000 + id % 10}</resultCode></ccr>"
        }
        val e = graft.etl.XmlBody.parse(body).get
        (id, graft.etl.XmlBody.smppXmlMsisdn(e),
          graft.etl.XmlBody.diamXmlResultCode(e))
      }
      .toDF("doc_id", "msisdn", "result_code")
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q36HttpFlow, q37SipCrossleg, q38PacketDecode,
    q39PcapReaders, q40GtpDecode, q41DltDispatch, q42Camel, q43XmlRules)
}
