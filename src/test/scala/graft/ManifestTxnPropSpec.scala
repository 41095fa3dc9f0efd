package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ManifestIO

/** Property pins for the manifest txn LEDGER ([[ManifestIO]]): render ∘
  * parse is the identity for arbitrary app ids (including ':'-laden
  * ones — the epoch is everything after each entry's LAST colon),
  * merge is last-writer-wins per app and keeps every other entry, and
  * the already-applied gate fires exactly on (same app, epoch ≤
  * recorded). Seeded generator rounds, the repo's prop-spec idiom.
  */
class ManifestTxnPropSpec extends AnyFunSuite {

  // app ids like real txnAppIds: non-empty, no ';'/newline/'='; colons
  // allowed ANYWHERE (the parser splits each entry on its LAST colon)
  private val appGen: Gen[String] = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 1 -> Gen.const(':'), 1 -> Gen.const('-')))
    .map(_.mkString)
  private val ledgerGen: Gen[Map[String, Long]] =
    Gen.mapOf(Gen.zip(appGen, Gen.chooseNum(0L, 1000000L)))

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = org.scalacheck.rng.Seed(seed)
    (0 until n).map { _ =>
      val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v
    }
  }

  private def roundTrip(m: Map[String, Long]): Map[String, Long] = {
    val kv = ManifestIO.renderTxns(m).linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    ManifestIO.parseTxns(kv)
  }

  test("ledger round-trips through the manifest text for arbitrary app ids") {
    samples(ledgerGen, 200, 41L).foreach { m =>
      assert(roundTrip(m) == m, s"round-trip broke for $m")
    }
    // the colon edge explicitly: an app id ENDING in ':' still parses
    // (the epoch is after the LAST colon of the rendered entry)
    assert(roundTrip(Map("app:" -> 7L, "a:b:c" -> 0L)) ==
      Map("app:" -> 7L, "a:b:c" -> 0L))
    assert(roundTrip(Map.empty) == Map.empty)
  }

  test("merge is last-writer-wins per app and keeps every other entry") {
    val triples = samples(
      Gen.zip(ledgerGen, appGen, Gen.chooseNum(0L, 1000000L)), 200, 42L)
    triples.foreach { case (prev, app, e) =>
      val merged = ManifestIO.mergeTxn(prev, Some((app, e)))
      assert(merged(app) == e)
      assert((prev - app).forall { case (a, v) => merged(a) == v })
      assert(ManifestIO.mergeTxn(prev, None) == prev)
    }
  }

  test("already-applied fires exactly on same app with epoch <= recorded") {
    samples(Gen.zip(ledgerGen, appGen, Gen.chooseNum(0L, 1000000L)), 200, 43L)
      .foreach { case (committed, app, e) =>
        assert(ManifestIO.txnAlreadyApplied(committed, Some((app, e))) ==
          committed.get(app).exists(_ >= e))
      }
    assert(!ManifestIO.txnAlreadyApplied(Map("a" -> 5L), None),
      "a txn-free tick is never gated")
  }

  test("a legacy single-slot txn= record reads into the ledger across the upgrade") {
    assert(ManifestIO.parseTxns(Map("txn" -> "app:7")) == Map("app" -> 7L),
      "a pre-ledger manifest's record must survive the format upgrade")
    // when both are present (a new writer committed over the old
    // record), the ledger wins for its apps
    assert(ManifestIO.parseTxns(Map("txn" -> "app:7", "txns" -> "app:9;b:1")) ==
      Map("app" -> 9L, "b" -> 1L))
  }

  test("a hostile legacy appId (';'/'%'/newline-laden) carries forward without bricking the manifest") {
    // the pre-ledger single-slot format never forbade ';' in appIds;
    // carried forward into the txns= map, such a key must render a
    // line the NEXT manifest read can still parse — before the
    // percent-escape, the embedded ';' split the entry mid-key and the
    // epoch field threw NumberFormatException, bricking the index dir
    val legacy = ManifestIO.parseTxns(Map("txn" -> "we;rd:5"))
    assert(legacy == Map("we;rd" -> 5L))
    assert(roundTrip(legacy) == legacy)
    val hostileGen = Gen.nonEmptyListOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.const(';'), 1 -> Gen.const('%'),
      1 -> Gen.const(':'), 1 -> Gen.const('\n')))
      .map(_.mkString)
    samples(Gen.mapOf(Gen.zip(hostileGen, Gen.chooseNum(0L, 1000L))), 200, 44L)
      .foreach { m => assert(roundTrip(m) == m, s"hostile round-trip broke for $m") }
  }

  test("mergeTxn rejects app ids that would corrupt the ledger line") {
    intercept[IllegalArgumentException] {
      ManifestIO.mergeTxn(Map.empty, Some(("bad;app", 1L)))
    }
    intercept[IllegalArgumentException] {
      ManifestIO.mergeTxn(Map.empty, Some(("bad\napp", 1L)))
    }
  }
}
