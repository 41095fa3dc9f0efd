package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.SpanDedup

/** One W-token window occurrence of a streaming document (top-level
  * for encoder codegen). */
final case class WindowOcc(h: Long, docId: Long, pos: Int)

/** A duplicated-window mark: token position `pos` of `docId` starts a
  * window whose content occurs more than once in the retained stream. */
final case class DupWindow(docId: Long, pos: Int)

/** Streaming exact-substring duplicate detection — the continuous form
  * of [[SpanDedup.dupSpans]]'s detection half: each arriving document's
  * W-token windows route to their content-hash key; the SECOND
  * occurrence of a hash emits duplicated-window marks for both the
  * retained first occurrence (retroactively, matching the batch
  * semantics where every occurrence of a ≥2-count window is marked) and
  * the arrival, and later occurrences emit immediately.
  *
  * State is deliberately two-phase so it shrinks as duplication is
  * established: while a hash has been seen once, its state is the one
  * retained occurrence; the moment it is seen again the occurrence list
  * is cleared and replaced by a boolean "marked" flag — a viral window
  * (the pathological case for retained-occurrence state) costs 1 bit of
  * state and O(1) per arrival, not a growing list. Both states carry
  * the native TTL, so unbounded ingest stays bounded (windows whose
  * first occurrence aged out re-mark from scratch — the same documented
  * trade as [[NearDupStream]] / [[DedupStream]]).
  *
  * Span MERGE (gaps-and-islands over a document's marked positions) is
  * the batch compaction's job — a document's marks accrete over time as
  * later stream content dups it, so its maximal spans are only final at
  * compaction, exactly like global pair closure for near-dup.
  */
class SpanDedupProcessor(retention: java.time.Duration)
    extends StatefulProcessor[Long, WindowOcc, DupWindow] {

  @transient private var first: ListState[WindowOcc] = _
  @transient private var marked: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    first = getHandle.getListState[WindowOcc]("first",
      Encoders.product[WindowOcc], new TTLConfig(retention))
    marked = getHandle.getValueState[Boolean]("marked",
      Encoders.scalaBoolean, new TTLConfig(retention))
  }

  override def handleInputRows(key: Long, rows: Iterator[WindowOcc],
      timerValues: TimerValues): Iterator[DupWindow] = {
    val out = Seq.newBuilder[DupWindow]
    for (row <- rows) {
      if (marked.exists()) {
        out += DupWindow(row.docId, row.pos)
      } else {
        val retained = first.get()
        if (retained.hasNext) {
          while (retained.hasNext) {
            val f = retained.next()
            out += DupWindow(f.docId, f.pos)
          }
          first.clear()
          marked.update(true)
          out += DupWindow(row.docId, row.pos)
        } else {
          first.appendValue(row)
        }
      }
    }
    out.result().iterator
  }
}

object SpanDedupStream {

  val DefaultRetention: java.time.Duration = java.time.Duration.ofHours(24)

  /** docs(idCol: long, textCol: string) → duplicated-window marks.
    * Shares [[SpanDedup.windowRows]]' tokenize+hash kernel, so a window
    * marked here is exactly a window the batch operator would count. */
  def dupWindows(docs: DataFrame, idCol: String, textCol: String, w: Int,
      retention: java.time.Duration = DefaultRetention): Dataset[DupWindow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr(s"CAST($idCol AS LONG)", textCol).as[(Long, String)]
      .flatMap { case (id, text) =>
        SpanDedup.windowOccs(id, text, w).map { case (d, p, h) => WindowOcc(h, d, p) }
      }
      .groupByKey(_.h)
      .transformWithState(new SpanDedupProcessor(retention),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
