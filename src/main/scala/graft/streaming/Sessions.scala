package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [[Sessions.correlateEventTime]] input: a correlation event with its
  * event-time column (top-level for encoder codegen). */
final case class TimedCorrEvent(key: String, isRequest: Boolean, frame: Long,
    eventTime: java.sql.Timestamp)

/** Streaming statefuls (SURVEY §2.10): the reference is batch-per-file
  * with dicts flushed at EOF; the streaming extension closes state by
  * *timeout* instead of EOF — `flatMapGroupsWithState` with processing-time
  * timeouts stands in for the dict + residual flush (K3,
  * `diameter.py:580-589`). Documented as an extension: the reference
  * defines no late-data policy.
  *
  * Works on both batch and streaming Datasets (on batch, Spark runs the
  * same state machine with a final implicit flush — semantics match the
  * reference's per-file EOF flush exactly).
  */
object Sessions {

  /** Generic gap-based session record. */
  final case class SessionEvent(key: Long, tsMicros: Long, id: Long, value: Double)
  final case class SessionSummary(key: Long, sessionStart: Long, sessionEnd: Long, nEvents: Long, sumValue: Double)
  final case class SessionBuf(start: Long, end: Long, n: Long, sum: Double)

  /** J7-style sessionization: a session closes when `gapMicros` elapses
    * between consecutive events of the same key (event-time order is the
    * arrival order within the group — batch callers must sort upstream or
    * accept arrival order, matching the reference's frame-order
    * semantics). */
  /** `flushAtEnd = true` is the batch mode: the trailing open session is
    * emitted when the group's data ends (the reference's per-file EOF
    * flush); in streaming mode (`false`) it stays in state and closes via
    * the processing-time timeout. */
  def sessionize(events: Dataset[SessionEvent], gapMicros: Long, flushAtEnd: Boolean = false)(
      implicit e1: Encoder[SessionSummary], e2: Encoder[SessionBuf], e3: Encoder[Long]): Dataset[SessionSummary] = {
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionBuf, SessionSummary](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: Long, it: Iterator[SessionEvent], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(b => SessionSummary(key, b.start, b.end, b.n, b.sum)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.id))
            val closed = Seq.newBuilder[SessionSummary]
            var buf = state.getOption.orNull
            for (ev <- sorted) {
              if (buf == null) buf = SessionBuf(ev.tsMicros, ev.tsMicros, 0L, 0.0)
              else if (ev.tsMicros - buf.end > gapMicros) {
                closed += SessionSummary(key, buf.start, buf.end, buf.n, buf.sum)
                buf = SessionBuf(ev.tsMicros, ev.tsMicros, 0L, 0.0)
              }
              buf = buf.copy(end = ev.tsMicros, n = buf.n + 1, sum = buf.sum + ev.value)
            }
            if (buf != null) {
              if (flushAtEnd) {
                closed += SessionSummary(key, buf.start, buf.end, buf.n, buf.sum)
                state.remove()
              } else {
                state.update(buf)
                state.setTimeoutDuration(gapMicros / 1000 + 1)
              }
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming J1: request stored per key, answer emits the correlated
    * pair; unmatched requests flush on state timeout (the streaming analog
    * of the EOF residue flush). */
  final case class CorrEvent(key: String, isRequest: Boolean, frame: Long, payload: String)
  final case class CorrPair(key: String, reqFrame: Long, resFrame: Long, matched: Boolean)

  def correlate(events: Dataset[CorrEvent], timeoutMs: Long)(
      implicit e1: Encoder[CorrPair], e2: Encoder[CorrEvent], e3: Encoder[String]): Dataset[CorrPair] = {
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CorrEvent, CorrPair](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, it: Iterator[CorrEvent], state: GroupState[CorrEvent]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(r => CorrPair(key, r.frame, -1L, matched = false)).iterator
            state.remove()
            out
          } else {
            val out = Seq.newBuilder[CorrPair]
            for (ev <- it.toSeq.sortBy(_.frame)) {
              if (ev.isRequest) {
                if (state.getOption.isEmpty) { // D1: retransmission dropped
                  state.update(ev)
                  state.setTimeoutDuration(timeoutMs)
                }
              } else state.getOption match {
                case Some(req) =>
                  out += CorrPair(key, req.frame, ev.frame, matched = true)
                  state.remove()
                case None =>
                  out += CorrPair(key, -1L, ev.frame, matched = false)
              }
            }
            out.result().iterator
          }
      }
  }

  /** [[correlate]] on EVENT time: the unmatched-request flush fires when
    * the WATERMARK passes request-time + timeout, not when a wall clock
    * does — so a 100 TB backfill replayed at full speed produces exactly
    * the rows the live stream did (processing-time flushes cannot make
    * that promise). The state machine itself is the same J1 logic. */
  def correlateEventTime(events: Dataset[TimedCorrEvent], watermarkDelay: String,
      timeoutMs: Long)(
      implicit e1: Encoder[CorrPair], e2: Encoder[TimedCorrEvent],
      e3: Encoder[String]): Dataset[CorrPair] = {
    events
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[TimedCorrEvent, CorrPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[TimedCorrEvent], state: GroupState[TimedCorrEvent]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(r => CorrPair(key, r.frame, -1L, matched = false)).iterator
            state.remove()
            out
          } else {
            val out = Seq.newBuilder[CorrPair]
            for (ev <- it.toSeq.sortBy(_.frame)) {
              if (ev.isRequest) {
                if (state.getOption.isEmpty) { // D1: retransmission dropped
                  state.update(ev)
                  state.setTimeoutTimestamp(ev.eventTime.getTime + timeoutMs)
                }
              } else state.getOption match {
                case Some(req) =>
                  out += CorrPair(key, req.frame, ev.frame, matched = true)
                  state.remove()
                case None =>
                  out += CorrPair(key, -1L, ev.frame, matched = false)
              }
            }
            out.result().iterator
          }
      }
  }
}
