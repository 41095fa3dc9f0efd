package graft

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Deterministic completion waits for the streaming specs.
  *
  * Round-4 lesson: a correctness-gating assertion must not depend on
  * wall-clock progress under load — `eventually(30s){count == n}` raced
  * a concurrent 32-thread job and timed out while the micro-batch was
  * still queued. The fixes, in preference order:
  *
  *  - [[drain]] — for queries with NO processing-time semantics at all
  *    (dropDuplicates, watermark/event-time state):
  *    `processAllAvailable()` blocks on the query handle until every
  *    queued micro-batch is committed, however slow the box is. The
  *    short bounded poll after it only absorbs the engine's no-data
  *    batch (watermark commits and event-time timeouts are applied one
  *    batch AFTER the data batch that advanced the watermark), which is
  *    scheduling-cheap and not CPU-bound.
  *  - [[poll]] — for ANY processing-time stateful: flatMapGroupsWithState
  *    with ProcessingTimeTimeout, and transformWithState with
  *    TimeMode.ProcessingTime even WITHOUT registered timers (verified
  *    empirically: TTL-only state still keeps the engine committing an
  *    epoch per trigger, so `processAllAvailable()` never returns and
  *    must not be called). A bounded poll is also semantically right
  *    where the asserted behavior (timer flush) IS wall-clock expiry.
  *  - [[awaitInputRows]] — before a ZERO-count assertion on a
  *    timer-driven query (where drain is unavailable): wait until the
  *    query's progress shows the batch consumed the rows, then assert.
  *    A bare `Thread.sleep(n); assert(count == 0)` passes vacuously on
  *    a box too loaded to have run the batch at all.
  */
object StreamSync {

  def poll(timeoutMs: Long = 60000L)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  def drain(q: StreamingQuery, fallbackMs: Long = 30000L)(cond: => Boolean): Boolean = {
    q.processAllAvailable()
    if (cond) true else poll(fallbackMs)(cond)
  }

  // Accumulated input rows per query id, fed by a listener: on a
  // TimeMode.ProcessingTime query the engine commits an epoch per
  // trigger, so the ~100-entry recentProgress ring can evict the one
  // data-carrying batch before a loaded test thread polls it. The
  // listener never misses a progress event once installed; the
  // recentProgress sum below covers batches that ran before install.
  private val seenRows = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
  locally {
    SparkTest.spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        seenRows.merge(e.progress.id, Long.box(e.progress.numInputRows), (a, b) => Long.box(a + b))
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
  }

  /** Input rows the query is known to have consumed. */
  def inputRows(q: StreamingQuery): Long =
    math.max(Option(seenRows.get(q.id)).map(_.longValue).getOrElse(0L),
      q.recentProgress.map(_.numInputRows).sum)

  def awaitInputRows(q: StreamingQuery, atLeast: Long, timeoutMs: Long = 60000L): Boolean =
    poll(timeoutMs)(inputRows(q) >= atLeast)
}
