package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.{Sigshark, TcapPkt, TcapSessState}
import graft.etl.Sigshark.Transaction

/** Streaming TCAP transaction sessionization (§2.10 analog of the batch
  * [[Sigshark.sessionize]]): the SAME incremental machine
  * ([[Sigshark.stepTcap]]) runs under `flatMapGroupsWithState`, keyed by
  * capture file, with still-open transactions and the tid-alias map
  * carried in group state — a begin in one micro-batch closed by an end
  * in a later one emits exactly the batch machine's transaction.
  *
  * Processing-time timeout is the streaming analog of the batch EOF
  * flush: on expiry the carried state surfaces (only) under
  * `keepPartial`, mirroring sigshark's `--incomplete`.
  */
object TcapStream {

  def transactions(pkts: Dataset[TcapPkt], timeoutMs: Long,
      keepPartial: Boolean = false): Dataset[Transaction] = {
    implicit val txEnc: org.apache.spark.sql.Encoder[Transaction] =
      Encoders.product[Transaction]
    implicit val stEnc: org.apache.spark.sql.Encoder[TcapSessState] =
      Encoders.product[TcapSessState]
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    pkts
      .groupByKey(_.pcapFilename)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout)(
        (_: String, it: Iterator[TcapPkt], state: GroupState[TcapSessState]) => {
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(TcapSessState(Nil, Map.empty))
            state.remove()
            Sigshark.flushTcap(st, keepPartial).iterator
          } else {
            val prior = state.getOption.getOrElse(TcapSessState(Nil, Map.empty))
            val (next, done) =
              Sigshark.stepTcap(prior, it.toSeq.sortBy(_.frameNo), keepPartial)
            if (next.open.isEmpty && next.alias.isEmpty) state.remove()
            else {
              state.update(next)
              state.setTimeoutDuration(timeoutMs)
            }
            done.iterator
          }
        })
  }
}
