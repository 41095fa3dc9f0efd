package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Pcap

/** SIP-over-UDP ingestion (SURVEY §2: P3-P4, P12, R5, F7, F8, F25, J6;
  * `sip_ingestor.py`).
  */
final case class SipMsg(
    framesList: String,
    firstFrame: Long,
    timeEpoch: Long,
    usecondsEpoch: Int,
    srcIp: String,
    dstIp: String,
    pcapFilename: String,
    method: String,
    statusCode: Option[Int],
    callId: String,
    fromUser: String,
    fromOriginal: String,
    toUser: String,
    toOriginal: String,
    sdpOSessionId: String,
    sdpOVersion: String)

object Sip {

  /** P12 method whitelist (`sip_ingestor.py:31-40`). */
  val Methods: Set[String] =
    Set("INVITE", "ACK", "PRACK", "INFO", "BYE", "CANCEL", "REGISTER", "UPDATE")

  private val UserPattern = "(?:sip|tel):\\+?([A-Za-z0-9_]+)".r

  /** F7: user extraction from a From:/To: header (`sip_ingestor.py:232-254`). */
  def extractUser(header: String): String =
    UserPattern.findFirstMatchIn(header).map(_.group(1)).getOrElse("")

  /** F8: 13-digit MSISDN normalization — original preserved, first 4
    * digits stripped for the working value (`sip_ingestor.py:234-236`).
    * Returns (user, original). */
  def normalizeUser(raw: String): (String, String) =
    if (raw.matches("^[0-9]{13}$")) (raw.substring(4), raw) else (raw, raw)

  /** F25: SDP owner line "o=user sess-id sess-version ..." →
    * (session-id, version) (`sip_ingestor.py:215-221`). */
  def sdpOwner(text: String): (String, String) =
    text.split("\r\n").find(_.startsWith("o="))
      .map(_.split(" "))
      .collect { case t if t.length >= 3 => (t(1), t(2)) }
      .getOrElse(("", ""))

  /** Parse one (reassembled) UDP payload. Rejects rows whose first token
    * is neither a whitelisted method nor `SIP/2.0` (P12). */
  def parse(framesList: String, firstFrame: Long, tsSec: Long, tsUsec: Int,
      srcIp: String, dstIp: String, file: String, text: String): Option[SipMsg] = {
    val firstLine = text.takeWhile(c => c != '\r' && c != '\n')
    val tok = firstLine.split(" ").headOption.getOrElse("")
    val (method, status) =
      if (Methods.contains(tok)) (tok, None)
      else if (tok == "SIP/2.0") ("", firstLine.split(" ").lift(1).flatMap(_.toIntOption))
      else return None
    def header(name: String): String = text.split("\r\n")
      .find(l => l.toLowerCase.startsWith(name.toLowerCase + ":"))
      .map(_.split(":", 2)(1).trim).getOrElse("")
    val (fromUser, fromOrig) = normalizeUser(extractUser(header("From")))
    val (toUser, toOrig) = normalizeUser(extractUser(header("To")))
    val (sdpId, sdpVer) = sdpOwner(text)
    Some(SipMsg(framesList, firstFrame, tsSec, tsUsec, srcIp, dstIp, file,
      method, status, header("Call-ID"), fromUser, fromOrig, toUser, toOrig,
      sdpId, sdpVer))
  }

  /** R5: IPv4 fragment reassembly keyed by (src, dst, IP id): fragments
    * with MF set stash; the final fragment completes and concatenates
    * frames_lists (`sip_ingestor.py:163-184`). */
  def defragment(frags: Seq[Packet]): Seq[(String, Packet, Array[Byte])] = {
    val sorted = frags.sortBy(_.frameNo)
    val out = Seq.newBuilder[(String, Packet, Array[Byte])]
    var buf: Array[Byte] = Array.emptyByteArray
    var frames: List[Long] = Nil
    var first: Packet = null
    for (p <- sorted) {
      if (first == null) first = p
      buf = buf ++ p.payload
      frames = p.frameNo :: frames
      if (!p.ipMoreFragments) {
        out += ((frames.reverse.mkString(" "), first, buf))
        buf = Array.emptyByteArray; frames = Nil; first = null
      }
    }
    out.result()
  }

  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Pcap.frames(spark, path)
      .flatMap(Packets.decode _)
      .filter(p => p.ipProto == Packets.ProtoUdp
        && p.srcPort != 53 && p.dstPort != 53) // P4: drop DNS
      .groupByKey(p => (p.pcapFilename, p.srcIp, p.dstIp, p.ipId))
      .flatMapGroups { (_, it) =>
        defragment(it.toSeq).iterator.flatMap { case (framesList, first, payload) =>
          new String(payload, java.nio.charset.StandardCharsets.UTF_8) match {
            case text => parse(framesList, first.frameNo, first.tsSec, first.tsUsec,
              first.srcIp, first.dstIp, first.pcapFilename, text)
          }
        }
      }
      .toDF()
  }

  /** J6 cross-leg call correlation (`sip_ingestor.py:332-433`), with the
    * hardcoded IP role sets promoted to parameters (SURVEY §7.3 #7):
    * rows on the `legB` side take their canonical from/to users from the
    * first `legA`-side INVITE sharing the same SDP owner key; originals
    * are preserved in from_original/to_original. */
  def crossLegCorrelate(msgs: DataFrame, legAIps: Set[String], legBIps: Set[String]): DataFrame = {
    val withLeg = msgs.withColumn("leg",
      when(col("srcIp").isin(legAIps.toSeq: _*), "A")
        .when(col("srcIp").isin(legBIps.toSeq: _*), "B")
        .otherwise("other"))
    val sdpKeyed = withLeg.filter(col("sdpOSessionId") =!= "")
    val canonical = sdpKeyed.filter(col("leg") === "A")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sdpOSessionId"), col("sdpOVersion")).orderBy(col("firstFrame"))))
      .filter(col("rn") === 1)
      .select(col("sdpOSessionId").as("c_sid"), col("sdpOVersion").as("c_ver"),
        col("fromUser").as("c_from"), col("toUser").as("c_to"))
    withLeg.join(broadcast(canonical),
        col("sdpOSessionId") === col("c_sid") && col("sdpOVersion") === col("c_ver"), "left")
      .withColumn("fromUser",
        when(col("leg") === "B" && col("c_from").isNotNull, col("c_from")).otherwise(col("fromUser")))
      .withColumn("toUser",
        when(col("leg") === "B" && col("c_to").isNotNull, col("c_to")).otherwise(col("toUser")))
      .drop("c_sid", "c_ver", "c_from", "c_to")
  }
}
