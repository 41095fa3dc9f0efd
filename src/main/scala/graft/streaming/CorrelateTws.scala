package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.streaming.Sessions.{CorrEvent, CorrPair}

/** J1 correlation on the `transformWithState` API (Spark 4 arbitrary
  * stateful processing — the SURVEY §2.10 "upgrade path" from
  * flatMapGroupsWithState): explicit `ValueState` slot + a registered
  * processing-time timer per pending request for the residue flush.
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
class CorrelateProcessor(timeoutMs: Long)
    extends StatefulProcessor[String, CorrEvent, CorrPair] {

  @transient private var pending: ValueState[CorrEvent] = _
  // Expiry timestamp of the timer registered for the pending request. Kept so
  // a match can deleteTimer() it — otherwise the stale timer fires while a
  // LATER request is pending on the same key and flushes it spuriously.
  @transient private var expiry: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getValueState[CorrEvent]("pending",
      Encoders.product[CorrEvent], TTLConfig.NONE)
    expiry = getHandle.getValueState[Long]("expiry",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[CorrEvent],
      timerValues: TimerValues): Iterator[CorrPair] = {
    val out = Seq.newBuilder[CorrPair]
    for (ev <- rows.toSeq.sortBy(_.frame)) {
      if (ev.isRequest) {
        if (!pending.exists()) { // D1: retransmission dropped
          pending.update(ev)
          val at = timerValues.getCurrentProcessingTimeInMs() + timeoutMs
          expiry.update(at)
          getHandle.registerTimer(at)
        }
      } else if (pending.exists()) {
        out += CorrPair(key, pending.get().frame, ev.frame, matched = true)
        if (expiry.exists()) getHandle.deleteTimer(expiry.get())
        pending.clear(); expiry.clear()
      } else {
        out += CorrPair(key, -1L, ev.frame, matched = false)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CorrPair] = {
    // K3 residue flush: unmatched request aged out. Guard against a stale
    // timer racing a newer pending request: only flush if this expiry is the
    // one registered for the currently pending request.
    val isCurrent = pending.exists() && expiry.exists() &&
      expiry.get() == expiredTimerInfo.getExpiryTimeInMs()
    if (isCurrent) {
      val out = Iterator(CorrPair(key, pending.get().frame, -1L, matched = false))
      pending.clear(); expiry.clear()
      out
    } else Iterator.empty
  }
}

object CorrelateTws {
  def correlate(events: Dataset[CorrEvent], timeoutMs: Long): Dataset[CorrPair] = {
    implicit val pairEnc: org.apache.spark.sql.Encoder[CorrPair] = Encoders.product[CorrPair]
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    events
      .groupByKey(_.key)
      .transformWithState(new CorrelateProcessor(timeoutMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
