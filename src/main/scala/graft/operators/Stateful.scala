package graft.operators

/** Keyed, order-dependent stateful operators (SURVEY §2.3 R1-R6 and §2.4
  * J1): payload reassembly and request↔response correlation.
  *
  * These are pure iterator→iterator state machines invoked from
  * `groupByKey(...).flatMapGroups` (batch) — the flow/correlation key is
  * the shuffle key, frame order is restored *inside* the group by an
  * explicit sort (SURVEY §7.3 #1: frame order is load-bearing; Spark must
  * impose it, never assume it). The same machines are reusable from
  * `flatMapGroupsWithState`/`transformWithState` in streaming mode.
  *
  * Scale: state is bounded per key (one in-flight buffer), groups are
  * per-flow — cardinality scales with flow count, not file size, so
  * `spark.sql.shuffle.partitions` spreads them evenly; no group ever holds
  * a whole file.
  */
object Stateful {

  /** One transport segment belonging to some flow key. */
  final case class Piece(
      frameNo: Long,
      tsSec: Long,
      tsUsec: Int,
      srcIp: String,
      dstIp: String,
      pcapFilename: String,
      payload: Array[Byte])

  /** A fully reassembled protocol message. `framesList` is the
    * space-joined source frame numbers (F20, `diameter.py:281,293`). */
  final case class Assembled(
      framesList: String,
      firstFrame: Long,
      tsSec: Long,
      tsUsec: Int,
      srcIp: String,
      dstIp: String,
      pcapFilename: String,
      payload: Array[Byte])

  /** R1/R2 stash-and-prepend reassembly (`diameter.py:274-287,360-373`):
    * walk segments in frame order; while the protocol's declared length
    * exceeds the buffered bytes, stash; each arrival appends to the stash
    * and concatenates frames_lists. Emits greedily: a buffer holding more
    * than one complete message yields one [[Assembled]] per message.
    *
    * `expectedLen(buf)` returns the declared total length of the message
    * starting at buf(0), or -1 if undecidable (undecidable ⇒ emit as-is,
    * matching the reference's "parse will fail and be quarantined" path).
    * Incomplete residue at EOF is dropped unless `emitResidue`.
    */
  def reassemble(
      pieces: Seq[Piece],
      expectedLen: Array[Byte] => Int,
      emitResidue: Boolean = false): Iterator[Assembled] = {
    val sorted = pieces.sortBy(_.frameNo)
    val out = Iterator.newBuilder[Assembled]
    var buf: Array[Byte] = Array.emptyByteArray
    var frames: List[Long] = Nil
    var first: Piece = null

    def flushComplete(): Unit = {
      var continue = true
      while (continue && buf.nonEmpty) {
        val want = expectedLen(buf)
        if (want > buf.length) continue = false // stash: wait for more
        else {
          val take = if (want > 0) want else buf.length
          out += Assembled(frames.reverse.mkString(" "), first.frameNo,
            first.tsSec, first.tsUsec, first.srcIp, first.dstIp,
            first.pcapFilename, java.util.Arrays.copyOfRange(buf, 0, take))
          buf = java.util.Arrays.copyOfRange(buf, take, buf.length)
          if (buf.isEmpty) { frames = Nil; first = null }
        }
      }
    }

    for (p <- sorted) {
      if (buf.isEmpty) {
        buf = p.payload
        frames = List(p.frameNo)
        first = p
      } else {
        buf = buf ++ p.payload
        frames = p.frameNo :: frames
      }
      flushComplete()
    }
    if (emitResidue && buf.nonEmpty && first != null)
      out += Assembled(frames.reverse.mkString(" "), first.frameNo, first.tsSec,
        first.tsUsec, first.srcIp, first.dstIp, first.pcapFilename, buf)
    out.result()
  }

  /** J1 correlation state machine (`diameter.py:302-339`): one pending
    * request slot per key. In frame order:
    *   - request + empty slot → store; request + occupied slot →
    *     retransmission, dropped (D1, `diameter.py:307-309`);
    *   - answer + occupied slot → bidirectional enrichment via `merge`,
    *     both rows emitted, slot cleared;
    *   - answer + empty slot → emitted unmatched.
    * Survivors flush at EOF (K3, `diameter.py:580-589`).
    *
    * `orderOf` supplies the frame order; `isRequest` splits the sides;
    * `merge(req, res)` returns the enriched (req, res) pair.
    */
  def correlate[T](
      msgs: Seq[T],
      orderOf: T => Long,
      isRequest: T => Boolean,
      merge: (T, T) => (T, T)): Iterator[T] = {
    val sorted = msgs.sortBy(orderOf)
    val out = Iterator.newBuilder[T]
    var pending: Option[T] = None
    for (m <- sorted) {
      if (isRequest(m)) {
        if (pending.isEmpty) pending = Some(m)
        // else: duplicate request with same key = retransmission → drop
      } else {
        pending match {
          case Some(req) =>
            val (r1, r2) = merge(req, m)
            out += r1
            out += r2
            pending = None
          case None => out += m
        }
      }
    }
    pending.foreach(out += _)
    out.result()
  }

  /** A2 last-non-*empty* (not merely non-null) propagation used by the
    * GTP/SMPP enrichment (`gtp_ingestor.py:42-71`): Spark's
    * `last(ignoreNulls)` with `nullif(col, '')` reproduces it — helper
    * lives here for the iterator-based pipelines. */
  def lastNonEmpty(values: Seq[String]): String =
    values.reverseIterator.find(v => v != null && v.nonEmpty).getOrElse("")
}
