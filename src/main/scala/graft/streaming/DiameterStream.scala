package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.etl.{Diameter, DiameterRec, Packets}
import graft.sources.Pcap

/** [[DiameterStream.recordsEventTime]] carrier: the decoded record plus
  * its capture timestamp as an event-time column (top-level case class
  * for encoder codegen; the column name is what `withWatermark`
  * anchors). */
final case class TimedDiameterRec(rec: DiameterRec, eventTime: java.sql.Timestamp)

/** Streaming Diameter ingestion (SURVEY §2.10: "Structured Streaming
  * file source watching a drop directory = the ingestion_queue
  * pattern"): `readStream(binaryFile)` over a capture drop-dir → frame
  * decode → Diameter decode → J1 correlation via
  * `flatMapGroupsWithState`, with unmatched requests flushed by state
  * timeout (the streaming analog of the EOF residue flush — an
  * *extension*, the reference defines no late-data policy).
  *
  * This drop-dir path decodes single-segment messages (the
  * overwhelmingly common case) with a single stateful operator. For
  * captures whose messages straddle transport segments *across
  * micro-batches*, [[ReassembleStream.diameterPairs]] chains the R1/R2
  * stash machine and J1 correlation as two `transformWithState`
  * operators in one query (NEXT.md #1, done).
  */
object DiameterStream {

  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** readStream(binaryFile) → pcap frame decode → Diameter decode: the
    * shared front of both correlation variants. */
  private def decoded(spark: SparkSession, watchDir: String): Dataset[DiameterRec] = {
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(BinaryFileSchema)
      .load(watchDir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => Pcap.decodeFile(p, bytes) }
      .flatMap(Packets.decode _)
      .filter(p => p.srcPort == Diameter.Port || p.dstPort == Diameter.Port)
      .flatMap { p =>
        val payload = p.ipProto match {
          case Packets.ProtoSctp =>
            Packets.sctpChunks(p).find(c => c.chunkType == 0 && c.payload.nonEmpty).map(_.payload)
          case Packets.ProtoTcp if p.payload.nonEmpty => Some(p.payload)
          case _ => None
        }
        payload.flatMap(Diameter.decode).filter(_.commandCode != Diameter.CmdDeviceWatchdog)
          .map(m => DiameterRec(p.frameNo.toString, p.tsSec, p.tsUsec, p.srcIp, p.dstIp,
            p.pcapFilename, m.request, m.commandCode, m.hopByHopId, m.endToEndId,
            m.sessionId, m.originHost, m.originRealm, m.destinationHost,
            m.destinationRealm, m.resultCode, m.expResultCode, m.msisdn, m.imsi))
      }
  }

  def records(spark: SparkSession, watchDir: String, timeoutMs: Long = 60000): Dataset[DiameterRec] = {
    import spark.implicits._
    decoded(spark, watchDir)
      // unlike the batch path, the correlation key does NOT include the
      // capture filename: the stream is one logical capture, so a request
      // in one dropped file pairs with its answer in a later one
      .groupByKey(r => (r.commandCode, r.hopByHopId, r.endToEndId, r.sessionId))
      .flatMapGroupsWithState[DiameterRec, DiameterRec](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_, it: Iterator[DiameterRec], state: GroupState[DiameterRec]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator // K3 residue flush
            state.remove()
            out
          } else {
            val out = Seq.newBuilder[DiameterRec]
            for (m <- it.toSeq.sortBy(_.framesList.split(" ").head.toLong)) {
              if (m.request) {
                if (state.getOption.isEmpty) { // D1 retransmission drop
                  state.update(m)
                  state.setTimeoutDuration(timeoutMs)
                }
              } else state.getOption match {
                case Some(req) =>
                  val msisdn = if (req.msisdn.nonEmpty) req.msisdn else m.msisdn
                  val imsi = if (req.imsi.nonEmpty) req.imsi else m.imsi
                  out += req.copy(msisdn = msisdn, imsi = imsi)
                  out += m.copy(msisdn = msisdn, imsi = imsi)
                  state.remove()
                case None => out += m
              }
            }
            out.result().iterator
          }
      }
  }

  /** [[records]] on EVENT time, end-to-end: the correlation clock is the
    * CAPTURE timestamp, not the ingestion wall clock — the unmatched-
    * request flush fires when the watermark (derived from packet
    * timestamps across the whole stream) passes request-time + timeout.
    * A 100 TB backfill replayed at full speed therefore produces exactly
    * the rows the live tail did; the processing-time variant cannot make
    * that promise (its flushes depend on ingestion pacing). Same J1/D1/
    * K3 machine otherwise. */
  def recordsEventTime(spark: SparkSession, watchDir: String,
      watermarkDelay: String = "10 seconds",
      timeoutMs: Long = 60000): Dataset[DiameterRec] = {
    import spark.implicits._
    decoded(spark, watchDir)
      .map(r => TimedDiameterRec(r,
        new java.sql.Timestamp(r.timeEpoch * 1000L + r.usecondsEpoch / 1000)))
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(t => (t.rec.commandCode, t.rec.hopByHopId, t.rec.endToEndId, t.rec.sessionId))
      .flatMapGroupsWithState[TimedDiameterRec, DiameterRec](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it: Iterator[TimedDiameterRec], state: GroupState[TimedDiameterRec]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(_.rec).iterator // K3 residue flush
            state.remove()
            out
          } else {
            val out = Seq.newBuilder[DiameterRec]
            for (t <- it.toSeq.sortBy(_.rec.framesList.split(" ").head.toLong)) {
              val m = t.rec
              if (m.request) {
                if (state.getOption.isEmpty) { // D1 retransmission drop
                  state.update(t)
                  state.setTimeoutTimestamp(t.eventTime.getTime + timeoutMs)
                }
              } else state.getOption match {
                case Some(reqT) =>
                  val req = reqT.rec
                  val msisdn = if (req.msisdn.nonEmpty) req.msisdn else m.msisdn
                  val imsi = if (req.imsi.nonEmpty) req.imsi else m.imsi
                  out += req.copy(msisdn = msisdn, imsi = imsi)
                  out += m.copy(msisdn = msisdn, imsi = imsi)
                  state.remove()
                case None => out += m
              }
            }
            out.result().iterator
          }
      }
  }
}
