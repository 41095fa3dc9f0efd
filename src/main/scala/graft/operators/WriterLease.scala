package graft.operators

import org.apache.spark.sql.SparkSession

/** Advisory WRITER LEASE over a committed index dir — the
  * [[Bm25]] / [[Ann]] IVF / [[MinhashIndex]] families all share the
  * [[ManifestIO]] layout and its single-writer discipline.
  *
  * The commit protocol DETECTS a violated discipline (lost-update
  * guards at slot-write and flip time kill the stale tick loudly) but
  * cannot stop two well-meaning jobs from interleaving in the first
  * place — e.g. a maintenance stream appending while an external
  * compaction or backfill job runs against the same dir, or a
  * concurrent vacuum reclaiming another writer's in-flight
  * UNCOMMITTED data dir (to the vacuum it is indistinguishable from a
  * crashed tick's orphan). This verb turns detection into
  * ENFORCEMENT: wrap every tick in [[withLease]] and concurrent
  * writers SERIALIZE; readers stay lock-free (they pin CURRENT and
  * never touch the lock).
  *
  * Mechanics ([[ManifestIO.acquireLease]]): an atomic
  * create-if-absent of `WRITER_LOCK` under the index dir holding a
  * fresh random token — an atomic NameNode op on HDFS, the O_EXCL
  * equivalent on the POSIX local FS. A holder whose tick outlives
  * `leaseMs` calls [[Lease.renew]] (heartbeat — refreshes the lock
  * mtime iff the token still matches); a lock whose mtime is older
  * than `leaseMs` belongs to a DEAD writer and is taken over by
  * renaming it to a token-unique tomb, which exactly one contender
  * wins. Release deletes the lock only while the stored token is
  * still the holder's own: a writer that overran its lease and was
  * usurped leaves the usurper's lock untouched, and its own commit
  * then dies on the lost-update guard — the lease serializes the
  * normal path, the guard stays the last line of defense.
  *
  * Object-store caveat: S3-class stores without atomic
  * create-if-absent need an external lock service (the same caveat
  * Delta's commit protocol carries); this verb targets HDFS/POSIX,
  * where ingest pipelines of this shape run.
  */
object WriterLease {

  /** A held lease; [[renew]] is the heartbeat for ticks longer than
    * the lease window. */
  final class Lease private[WriterLease] (spark: SparkSession, dir: String,
      private[operators] val token: String) {
    /** Refresh the heartbeat; false = usurped (stop writing — the
      * commit guard would kill the tick anyway, this is the polite
      * early exit). */
    def renew(): Boolean = ManifestIO.renewLease(spark, dir, token)
  }

  /** Run `f` holding `dir`'s writer lease: waits up to `waitMs` for a
    * live holder to release (then fails loudly); takes over a lease
    * whose heartbeat is older than `leaseMs`. The lease is released
    * on every exit path, including a throwing `f`. */
  def withLease[T](spark: SparkSession, dir: String,
      leaseMs: Long = 600000L, waitMs: Long = 60000L)(f: Lease => T): T = {
    val token = ManifestIO.acquireLease(spark, dir, leaseMs, waitMs)
    try f(new Lease(spark, dir, token))
    finally ManifestIO.releaseLease(spark, dir, token)
  }
}
