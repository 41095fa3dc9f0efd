package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Stateful.Piece
import graft.sources.Pcap

/** HTTP-over-TCP ingestion (SURVEY §2: P5-P6, P10-P11, R3, D2, F9-F10,
  * F28, J4; `http_ingestor.py`).
  *
  * Reassembly (R3): segments of a 4-tuple flow are walked in frame order;
  * a segment whose first line parses as an HTTP request/response starts a
  * new message, anything else is a continuation appended to the in-flight
  * message (`http_ingestor.py:433-448`). Retransmissions (same seq+ack as
  * an already-seen segment) are dropped first (D2).
  *
  * Linking (J4): the reference bulk-inserts responses first to obtain DB
  * ids, then patches each request's `http_response_in` — redesigned here
  * as engine-assigned `row_number()` ids + a reversed-4-tuple join,
  * preserving the reference's "last response wins" rule
  * (`http_ingestor.py:484-492`; SURVEY §7.3 #2 documents the id-value
  * deviation).
  */
final case class HttpMsg(
    framesList: String,
    firstFrame: Long,
    timeEpoch: Long,
    usecondsEpoch: Int,
    srcIp: String,
    dstIp: String,
    pcapFilename: String,
    srcPort: Int,
    dstPort: Int,
    tcpSequence: Long,
    tcpAcknowledge: Long,
    httpIsRequest: Boolean,
    method: String,
    uri: String,
    responseCode: Option[Int],
    contentType: String,
    contentLength: Option[Int],
    bodyType: String,
    body: String)

object Http {

  private val RequestLine = "(?i)^[a-z]+ +\\S+ +http/1\\.[01]$".r
  private val ResponseLine = "(?i)^http/1\\.[01] +[1-5][0-9]{2}.*$".r

  /** P10: does this payload start an HTTP message?
    * (`http_ingestor.py:167-174`). */
  def isHttpStart(s: String): Boolean = {
    val line = s.takeWhile(c => c != '\r' && c != '\n')
    RequestLine.matches(line) || ResponseLine.matches(line)
  }

  /** P11: permissive UTF-8 decode; None = undecodable → dropped
    * (`http_ingestor.py:148-155`). */
  def utf8(b: Array[Byte]): Option[String] =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  /** F9/F10/F28: parse one reassembled HTTP payload into a message.
    * Returns None when the text does not start with an HTTP line. */
  def parse(framesList: String, firstFrame: Long, tsSec: Long, tsUsec: Int,
      srcIp: String, dstIp: String, file: String, srcPort: Int, dstPort: Int,
      seq: Long, ack: Long, text: String): Option[HttpMsg] = {
    if (!isHttpStart(text)) return None
    val headEnd = text.indexOf("\r\n\r\n")
    val (head, body) =
      if (headEnd >= 0) (text.substring(0, headEnd), text.substring(headEnd + 4))
      else (text, "")
    val lines = head.split("\r\n")
    val first = lines.head
    val isReq = !first.toLowerCase.startsWith("http/")

    def header(name: String): Option[String] = lines.tail.collectFirst {
      case l if l.toLowerCase.contains(name.toLowerCase + ":") =>
        l.split(":", 2)(1).trim
    }
    val contentLength = header("Content-Length").flatMap(_.toIntOption)
    val contentType = header("Content-Type").getOrElse("")
    // F28 body-status typing (`http_ocs_ingestor.py:304-313`)
    val bodyType =
      if (contentLength.isEmpty) "noContent"
      else if (body.isEmpty) "httpIncomplete"
      else "content"
    if (isReq) {
      val parts = first.split(" +")
      val method = parts.headOption.getOrElse("")
      val path = if (parts.length > 1) parts(1) else ""
      // F10: URI synthesis incl. the reference's trailing space
      val uri = s"http://$dstIp:$dstPort$path "
      Some(HttpMsg(framesList, firstFrame, tsSec, tsUsec, srcIp, dstIp, file,
        srcPort, dstPort, seq, ack, httpIsRequest = true, method, uri, None,
        contentType, contentLength, bodyType, body))
    } else {
      val code = first.split(" +").lift(1).flatMap(_.toIntOption)
      Some(HttpMsg(framesList, firstFrame, tsSec, tsUsec, srcIp, dstIp, file,
        srcPort, dstPort, seq, ack, httpIsRequest = false, "", "", code,
        contentType, contentLength, bodyType, body))
    }
  }

  /** R3 segment accumulation for one 4-tuple flow: HTTP-start segments
    * open a message; continuations append; (seq, ack) duplicates drop
    * (D2). Emits raw (meta, text) per message. Ports must be passed in
    * (Piece carries none) so the F10 URI synthesis sees the real
    * destination port. */
  def reassembleFlow(segs: Seq[(Piece, Long, Long)],
      srcPort: Int = 0, dstPort: Int = 0): Seq[HttpMsg] = {
    val sorted = segs.sortBy(_._1.frameNo)
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val out = Seq.newBuilder[HttpMsg]
    var cur: (Piece, Long, Long, StringBuilder, List[Long]) = null

    def flush(): Unit = if (cur != null) {
      val (p, seq, ack, sb, frames) = cur
      parse(frames.reverse.mkString(" "), p.frameNo, p.tsSec, p.tsUsec,
        p.srcIp, p.dstIp, p.pcapFilename, srcPort, dstPort, seq, ack, sb.toString)
        .foreach(out += _)
      cur = null
    }

    for ((piece, seq, ack) <- sorted) {
      if (seen.add((seq, ack))) {
        utf8(piece.payload) match {
          case None => () // P11: silently dropped
          case Some(text) =>
            if (isHttpStart(text)) {
              flush()
              cur = (piece, seq, ack, new StringBuilder(text), List(piece.frameNo))
            } else if (cur != null) {
              cur._4.append(text)
              cur = cur.copy(_5 = piece.frameNo :: cur._5)
            } // non-HTTP segment with no in-flight message → dropped
        }
      } // D2 retransmission dropped
    }
    flush()
    out.result()
  }

  /** Shared front half of the HTTP-family pipelines (http, http_ss7,
    * http_ocs): pcap → TCP → per-flow reassembly → parsed messages.
    * Shuffle key is the 4-tuple flow, never the file. */
  def messages(spark: SparkSession, path: String): Dataset[HttpMsg] = {
    import spark.implicits._
    Pcap.frames(spark, path)
      .flatMap(Packets.decode _)
      .filter(p => p.ipProto == Packets.ProtoTcp
        && (p.tcpFlags == 16 || p.tcpFlags == 24) && p.payload.nonEmpty)
      .groupByKey(p => (p.pcapFilename, p.srcIp, p.srcPort, p.dstIp, p.dstPort))
      .flatMapGroups { (key, it) =>
        val (_, _, srcPort, _, dstPort) = key
        reassembleFlow(it.map(p =>
          (Piece(p.frameNo, p.tsSec, p.tsUsec, p.srcIp, p.dstIp, p.pcapFilename, p.payload),
            p.tcpSeq, p.tcpAck)).toSeq, srcPort, dstPort)
      }
  }

  /** Full pipeline: pcap → HTTP messages with ids + J4 request→response
    * linking (`http_response_in` = id of the LAST response whose 4-tuple
    * is the reverse of the request's). Ports are patched from the flow
    * key after reassembly. */
  def records(spark: SparkSession, path: String): DataFrame =
    link(messages(spark, path).toDF())

  /** J4 linking, engine-side ids (SURVEY §4.2 "redesigned").
    *
    * Scale note: ids are a row_number window per capture FILE — one
    * pathological multi-GB capture is one window partition. That matches
    * the corpus-of-files model this source is built on (same unit of
    * parallelism as the one-file-one-partition reader); per-flow id
    * schemes would scale further but break the reference's file-scoped
    * id semantics. */
  def link(msgs: DataFrame): DataFrame = {
    val withId = msgs.withColumn("id",
      row_number().over(Window.partitionBy(col("pcapFilename"))
        .orderBy(col("firstFrame"), col("tcpSequence"))).cast("long"))
    val req = withId.filter(col("httpIsRequest"))
    val res = withId.filter(!col("httpIsRequest"))
      .groupBy(col("pcapFilename").as("r_file"), col("srcIp").as("r_src"),
        col("srcPort").as("r_sport"), col("dstIp").as("r_dst"), col("dstPort").as("r_dport"))
      .agg(max(col("id")).as("http_response_in"))
    req.join(res,
      col("pcapFilename") === col("r_file")
        && col("srcIp") === col("r_dst") && col("srcPort") === col("r_dport")
        && col("dstIp") === col("r_src") && col("dstPort") === col("r_sport"),
      "left")
      .drop("r_file", "r_src", "r_sport", "r_dst", "r_dport")
      .unionByName(withId.filter(!col("httpIsRequest"))
        .withColumn("http_response_in", lit(null).cast("long")))
  }
}
