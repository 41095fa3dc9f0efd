package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ManifestIO, WriterLease}

/** Writer-lease enforcement ([[WriterLease]] /
  * [[ManifestIO.acquireLease]]): concurrent writers on one index dir
  * serialize; a contender facing a LIVE holder times out loudly; a
  * DEAD holder's lock (stale heartbeat) is taken over; release is
  * token-guarded so an usurped holder cannot delete the usurper's
  * lock; a throwing tick still releases. The lease is the enforcement
  * half of the single-writer discipline — the commit protocol's
  * lost-update guard (LifecycleSpec) stays the last line of defense.
  */
class LeaseSpec extends AnyFunSuite {

  private def lockFile(dir: String) = new java.io.File(s"$dir/WRITER_LOCK")

  test("two leased writers serialize: no interleaved critical sections") {
    val spark = SparkTest.spark
    val dir = Files.createTempDirectory("lease_ser").toString
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 4).map { i =>
      new Thread(() =>
        WriterLease.withLease(spark, dir, leaseMs = 60000L, waitMs = 30000L) { _ =>
          log.add(s"enter$i")
          Thread.sleep(50) // widen the window an interleaving would need
          log.add(s"exit$i")
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    val seq = log.toArray(Array.empty[String]).toSeq
    assert(seq.length == 8, s"every writer must run exactly once: $seq")
    // strictly alternating enter/exit with matching indices = serialized
    seq.grouped(2).foreach { case Seq(en, ex) =>
      assert(en.startsWith("enter") && ex == "exit" + en.stripPrefix("enter"),
        s"critical sections interleaved: $seq")
    }
    assert(!lockFile(dir).exists(), "final release must remove the lock")
  }

  test("a live holder blocks contenders until timeout, loudly") {
    val spark = SparkTest.spark
    val dir = Files.createTempDirectory("lease_live").toString
    val release = new java.util.concurrent.CountDownLatch(1)
    val held = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLease.withLease(spark, dir, leaseMs = 60000L, waitMs = 1000L) { _ =>
        held.countDown()
        release.await()
      })
    holder.start()
    held.await()
    val e = intercept[IllegalStateException] {
      WriterLease.withLease(spark, dir, leaseMs = 60000L, waitMs = 400L)(_ => ())
    }
    assert(e.getMessage.contains("still held"),
      s"contender must fail loudly, got: ${e.getMessage}")
    release.countDown()
    holder.join(30000)
    assert(!lockFile(dir).exists())
  }

  test("a dead holder's stale lease is taken over; a fresh one is not") {
    val spark = SparkTest.spark
    val dir = Files.createTempDirectory("lease_stale").toString
    // simulate a crashed writer: a lock file nobody will ever release
    val orphan = ManifestIO.acquireLease(spark, dir, leaseMs = 500L, waitMs = 100L)
    assert(lockFile(dir).exists())
    // heartbeat still fresh → contender with a long lease window waits out
    intercept[IllegalStateException] {
      ManifestIO.acquireLease(spark, dir, leaseMs = 60000L, waitMs = 300L)
    }
    // age the heartbeat past the contender's lease window → takeover
    assert(lockFile(dir).setLastModified(System.currentTimeMillis() - 1000L))
    var ran = false
    WriterLease.withLease(spark, dir, leaseMs = 500L, waitMs = 5000L) { _ =>
      ran = true
    }
    assert(ran, "the stale lease must be usurped")
    assert(!lockFile(dir).exists())
    // the orphan token is long gone; releasing it must be a no-op
    ManifestIO.releaseLease(spark, dir, orphan)
  }

  test("renew refreshes the heartbeat; an usurped holder can't release the usurper") {
    val spark = SparkTest.spark
    val dir = Files.createTempDirectory("lease_renew").toString
    val first = ManifestIO.acquireLease(spark, dir, leaseMs = 60000L, waitMs = 100L)
    assert(ManifestIO.renewLease(spark, dir, first),
      "the live holder's renew must succeed")
    // force-expire and usurp
    assert(lockFile(dir).setLastModified(System.currentTimeMillis() - 120000L))
    val second = ManifestIO.acquireLease(spark, dir, leaseMs = 60000L, waitMs = 5000L)
    assert(!ManifestIO.renewLease(spark, dir, first),
      "an usurped holder's renew must report the loss")
    ManifestIO.releaseLease(spark, dir, first) // must NOT delete second's lock
    assert(lockFile(dir).exists(),
      "token-guarded release: the usurped holder must leave the usurper's lock")
    ManifestIO.releaseLease(spark, dir, second)
    assert(!lockFile(dir).exists())
  }

  test("two leased BM25 append ticks serialize end-to-end: both commit, serve == rebuild") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("lease_e2e").toString
    val base = (0 until 20).map(i => (i.toLong, s"w${i % 5} common"))
    graft.operators.Bm25.buildIndex(base.toDF("doc_id", "text"),
      "doc_id", "text", dir)
    // two concurrent writers, disjoint batches: WITHOUT the lease this
    // interleaving dies on the commit protocol's lost-update guard
    // (both ticks pin version 1 and race for slot 2); WITH it the
    // second acquirer re-reads the first's commit and lands on slot 3
    val batches = Seq(
      (100 until 110).map(i => (i.toLong, s"w${i % 5} fresh common")),
      (200 until 210).map(i => (i.toLong, s"w${i % 5} fresh common")))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = batches.map { b =>
      new Thread(() =>
        try WriterLease.withLease(spark, dir, leaseMs = 120000L,
          waitMs = 120000L) { _ =>
          graft.operators.Bm25.appendToIndex(spark, dir,
            b.toDF("doc_id", "text"), "doc_id", "text")
        } catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000))
    assert(failures.isEmpty, s"both leased ticks must commit: ${failures.peek()}")
    assert(graft.operators.Bm25.readManifest(spark, dir).version == 3L,
      "two serialized ticks = two committed versions after the build")
    // end state == the one-shot rebuild over the union
    val union = base ++ batches.flatten
    val refDir = Files.createTempDirectory("lease_e2e_ref").toString
    graft.operators.Bm25.buildIndex(union.toDF("doc_id", "text"),
      "doc_id", "text", refDir)
    val q = Seq((1L, "common"), (2L, "fresh"), (3L, "w3")).toDF("qid", "term")
    val got = graft.operators.Bm25.serveTopK(spark, dir, q, k = 5)
      .orderBy(col("qid"), col("rank")).collect().toSeq
    val want = graft.operators.Bm25.serveTopK(spark, refDir, q, k = 5)
      .orderBy(col("qid"), col("rank")).collect().toSeq
    assert(got == want, "serialized concurrent appends must equal the rebuild")
  }

  test("a throwing tick still releases; leased() serializes sink ticks") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("lease_throw").toString
    intercept[RuntimeException] {
      WriterLease.withLease(spark, dir, leaseMs = 60000L, waitMs = 1000L) { _ =>
        throw new RuntimeException("tick died")
      }
    }
    assert(!lockFile(dir).exists(), "a throwing tick must release the lease")
    // the sink combinator: same acquire/release bracket per tick
    var ticks = 0
    val sink = graft.streaming.IndexMaintain.leased(dir, waitMs = 1000L) {
      (_, _) =>
        assert(lockFile(dir).exists(), "the tick body must run under the lease")
        ticks += 1
    }
    val batch = Seq((1L, "a")).toDF("doc_id", "text")
    sink(batch, 0L)
    sink(batch, 1L)
    assert(ticks == 2 && !lockFile(dir).exists())
  }
}
