package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BigramLm, Bm25, Dedup, Layout, SpanDedup}

/** Round-4 corpus-curation operators: exact-substring span dedup, BM25
  * retrieval, bigram LM scoring, shard layout, leak-free splits —
  * hand-computed expectations on tiny corpora (the oracle queries
  * t17-t21 cover the same operators against DuckDB at sf0.01). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("span dedup: cross-doc shared prefix merges into one span") {
    val d = docs(
      0L -> "a b c d e f g h i j",
      1L -> "a b c d e f g h X Y",
      2L -> "z z z")
    val spans = SpanDedup.dupSpans(d, "doc_id", "text", w = 4)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // windows 1..5 ("a b c d" .. "e f g h") are shared; span covers
    // tokens 1..8 in both docs; d2 is shorter than the window
    assert(spans === Seq(
      (0L, 1L, 8L, 8L, 5L),
      (1L, 1L, 8L, 8L, 5L)))
  }

  test("span dedup: within-doc periodic repeat spans the whole doc") {
    val d = docs(0L -> "p q r s p q r s p q r s", 1L -> "entirely different tokens here")
    val spans = SpanDedup.dupSpans(d, "doc_id", "text", w = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // period-4 repeat: every window position 1..9 recurs (pos i == pos i+4)
    assert(spans === Seq((0L, 1L, 12L, 12L, 9L)))
  }

  test("span dedup: disjoint duplicated regions stay separate spans") {
    val d = docs(
      0L -> "s1 s2 s3 s4 m1 m2 m3 m4 m5 m6 e1 e2 e3 e4",
      1L -> "s1 s2 s3 s4 q1 q2 q3 q4 q5 q6 e1 e2 e3 e4")
    val spans = SpanDedup.dupSpans(d, "doc_id", "text", w = 4)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // shared head (window pos 1) and shared tail (window pos 11): the
    // gap of 10 > w keeps them separate islands
    assert(spans === Seq(
      (0L, 1L, 4L, 4L, 1L), (0L, 11L, 14L, 4L, 1L),
      (1L, 1L, 4L, 4L, 1L), (1L, 11L, 14L, 4L, 1L)))
  }

  test("span dedup: internal window cache does not outlive the operator") {
    // The round-5 design recomputed the window pass twice to avoid a
    // session cache leak; round 6 persists it for exactly the two
    // internal consumers and unpersists before returning. TVF contract:
    // nothing may remain registered in the CacheManager after the call,
    // and the only lineage pin left is the duplicated-positions
    // localCheckpoint (ContextCleaner-reclaimed).
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val d = docs(
      0L -> "a b c d e f g h i j",
      1L -> "a b c d e f g h X Y")
    val spans = SpanDedup.dupSpans(d, "doc_id", "text", w = 4)
    assert(cm.isEmpty,
      "dupSpans must unpersist its window frame before returning")
    assert(spans.count() == 2)
    assert(cm.isEmpty)
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leftover.size <= 1,
      s"only the dup-positions checkpoint may remain, got $leftover")
    // the other TVF-exposed dedup kernels pin RDD-level checkpoints,
    // never CacheManager entries (round-6 leak-class sweep)
    Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5).count()
    Dedup.simhashNearStats(d, "doc_id", "text", 3).count()
    assert(cm.isEmpty,
      "ngramJaccardPairs/simhashNearStats must not register session caches")
  }

  test("span cut: keep-first corpus-wide, later occurrences removed, short docs untouched") {
    val d = docs(
      0L -> "a b c d e f g h",          // first occurrence of the window → kept whole
      1L -> "X a b c d e f g h Y",      // repeat at pos 2..9 → cut, X Y survive
      2L -> "a b c d e f g h",          // another full repeat → fully cut
      3L -> "short doc")                // < w tokens → untouched
    val out = SpanDedup.cutSpans(d, "doc_id", "text", w = 8)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (0L, "a b c d e f g h", 0L),
      (1L, "X Y", 8L),
      (2L, "", 8L),
      (3L, "short doc", 0L)))
  }

  test("ngram contamination: shared window flags the train doc; counts are distinct/total") {
    val eval = docs(100L -> "the secret eval answer is forty two exactly")
    val train = docs(
      // contains the eval 8-gram once → 1 window, 1 position
      0L -> "preamble the secret eval answer is forty two exactly postamble",
      // contains it twice → 1 distinct window, 2 positions
      1L -> ("the secret eval answer is forty two exactly and again " +
        "the secret eval answer is forty two exactly"),
      // shares 7 of 8 tokens only → clean
      2L -> "the secret eval answer is forty two roughly speaking",
      3L -> "entirely unrelated training document text goes here now")
    val out = SpanDedup.ngramContamination(train, eval, "doc_id", "text", 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 1L, 1L), (1L, 1L, 2L)))
  }

  test("phrase tagging: non-overlapping left-to-right counts, no-hit docs emit nothing") {
    val d = docs(
      0L -> "aba ababa abab",     // "aba": pos 0, then in "ababa" pos 4 only (non-overlap), "abab" pos 10 → 3
      1L -> "no matches here",
      2L -> "xx yy xx")
    val out = graft.operators.Phrases.tag(d, "doc_id", "text", Seq("aba", "xx"))
      .orderBy("doc_id", "phrase")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((0L, "aba", 3L), (2L, "xx", 2L)))
    // the exact same semantics as SQL's replace-length formula
    assert(graft.operators.Phrases.tag(d, "doc_id", "text", Seq("aba"))
      .collect().head.getLong(2) ==
      ("aba ababa abab".length - "aba ababa abab".replace("aba", "").length) / 3)
    // NULL text yields no hits (no NPE) — arbitrary-parquet TVF surface
    val withNull = Seq((0L, "xx here"), (1L, null)).toDF("doc_id", "text")
    assert(graft.operators.Phrases.tag(withNull, "doc_id", "text", Seq("xx"))
      .as[(Long, String, Long)].collect().toSeq === Seq((0L, "xx", 1L)))
  }

  test("pagerank: hand-computed two rounds on a 3-node graph; dups and self-loops dropped") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 2L), (2L, 2L))
      .toDF("src", "dst") // duplicate 1->2 and self-loop 2->2 must drop
    val nodes = Seq(0L, 1L, 2L).toDF("node_id")
    val got = graft.operators.PageRank.run(edges, "src", "dst", nodes, "node_id", iters = 2)
      .orderBy("node")
      .as[(Long, Long)].collect().toSeq
    // r1: 0 -> 150000 (no in-links); 1 -> 150000 + 85%*(1e6/2) = 575000;
    //     2 -> 150000 + 85%*(1e6/2 + 1e6) = 1425000
    // r2: 1 -> 150000 + 85%*(150000/2) = 213750;
    //     2 -> 150000 + 85%*(75000 + 575000) = 702500
    assert(got === Seq((0L, 150000L), (1L, 213750L), (2L, 702500L)))
  }

  test("bm25: scores match the formula, ranking is deterministic") {
    val d = docs(
      0L -> "spark join spark",
      1L -> "join window",
      2L -> "other text here")
    val out = Bm25.topK(d, "doc_id", "text", Seq("spark", "join"), topK = 3)
      .as[(Long, Double, Double, Double)].collect().toSeq
    // independent reimplementation of the score, same double order
    val n = 3L; val avgdl = 8.0 / 3
    def score(tf: Long, df: Long, dl: Long): Double =
      (((n - df + 0.5) / (df + 0.5)) * (tf * Bm25.K1Plus1)) /
        (tf + Bm25.K1 * (Bm25.OneMinusB + Bm25.B * (dl.toDouble / avgdl)))
    val s0spark = score(2, 1, 3); val s0join = score(1, 2, 3)
    val s1join = score(1, 2, 2)
    assert(out.map(_._1) === Seq(0L, 1L))
    assert(out(0) === ((0L, s0spark, s0join, s0spark + s0join)))
    assert(out(1) === ((1L, 0.0, s1join, 0.0 + s1join)))
  }

  test("bigram lm: fixed-point scores match hand computation") {
    val d = docs(0L -> "a b a b", 1L -> "a b", 2L -> "x")
    val out = BigramLm.scores(d, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // c1: a=3, b=3, x=1; V=3; c2: "a b"=3, "b a"=1
    // p(a b) = 4_000_000 div 6 = 666666 ; p(b a) = 2_000_000 div 6 = 333333
    assert(out === Seq(
      (0L, 3L, 666666L + 333333L + 666666L, (666666L + 333333L + 666666L) / 3),
      (1L, 1L, 666666L, 666666L)))
  }

  test("shard positions: two-phase layout equals the naive per-shard window") {
    val base = spark.range(1, 101)
      .select(col("id"), (col("id") % 4).as("shard"), md5(col("id").cast("string")).as("k"))
    val got = Layout.shardPositions(base, "shard", Seq("k", "id"), "pos", numPartitions = 5)
      .select(col("id"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("k"), col("id"))
    val want = base.select(col("id"), row_number().over(w).cast("long").as("pos"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() === 100)
  }

  test("grouped running totals: two-phase layout equals the naive per-group window") {
    val base = spark.range(1, 201)
      .select(col("id"),
        concat(lit("src"), (col("id") % 3).cast("string")).as("g"),
        (col("id") % 7 + 1).as("v"),
        md5(col("id").cast("string")).as("k"))
    val got = Layout.groupRunningTotals(base, "g", Seq("k", "id"), "v", "cum", numPartitions = 5)
      .select(col("id"), col("cum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("k"), col("id"))
      .rowsBetween(Long.MinValue, 0)
    val want = base.select(col("id"), sum(col("v")).over(w).as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("source mix: budget is an inclusive cap, selection is hash-stable") {
    val d = Seq(
      (0L, "ten t t t t t t t t t", "a"),
      (1L, "ten t t t t t t t t t", "a"),
      (2L, "ten t t t t t t t t t", "a"),
      (3L, "short text", "b")).toDF("doc_id", "text", "source")
    val out = Layout.sourceMix(d, "doc_id", "text", "source", tokenBudget = 20L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // source a: three 10-token docs -> exactly two fit the 20-token
    // budget, chosen by md5(doc_id) order; source b fits entirely
    val aDocs = out.filter(_._2 == "a")
    assert(aDocs.length === 2 && aDocs.map(_._4).sorted === Seq(10L, 20L))
    assert(out.filter(_._2 == "b").map(t => (t._3, t._4)) === Seq((2L, 2L)))
  }

  test("cross-corpus dedup pairs only across the boundary") {
    val shared = "one two three four five six seven eight nine ten"
    val newDocs = docs(
      100L -> shared,            // dups a reference doc
      101L -> shared,            // ALSO dups 100 — but new×new must not pair
      102L -> "nothing like anything else in this corpus at all ok")
    val refDocs = docs(
      0L -> shared,
      1L -> "reference body with its own completely distinct wording here",
      2L -> shared)              // ref×ref dup — must not pair either
    val pairs = Dedup.minhashLshPairsAcross(newDocs, refDocs, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
      .orderBy("da", "db")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((100L, 0L), (100L, 2L), (101L, 0L), (101L, 2L)))
    assert(pairs.forall(_._3 === 1.0))
  }

  test("shard writer: partitioned layout, in-file order, manifest totals") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val base = spark.range(0, 60)
      .select(col("id").as("doc_id"), (col("id") % 4).as("shard"),
        md5(col("id").cast("string")).as("k"), (col("id") % 5 + 1).as("n_tokens"))
    val laidOut = Layout.shardPositions(base, "shard", Seq("k", "doc_id"), "pos")
    Layout.writeShards(laidOut, "shard", "pos", "n_tokens", out)
    // partitioned directories exist and read back shard-pruned
    val shard2 = spark.read.parquet(out).filter(col("shard") === 2)
    assert(shard2.count() === 15)
    // rows inside each shard's file are stored in position order
    val stored = spark.read.parquet(out).filter(col("shard") === 2)
      .select("pos").as[Long].collect().toSeq
    assert(stored === stored.sorted)
    // manifest totals match the corpus
    val man = spark.read.parquet(out + "/_manifest")
      .orderBy("shard").as[(Long, Long, Long)].collect().toSeq
    assert(man.map(_._2).sum === 60L)
    assert(man.map(_._3).sum === (0L until 60L).map(_ % 5 + 1).sum)
  }

  test("temperature sampling: boosted small source kept whole, damped large source hash-gated") {
    // src a: 64 docs, src b: 4 docs → n=68, w=(8,2), z=10, T=(68*2)/5=27
    // rate_a = 8*27/(10*64) = 0.3375 ; rate_b = 2*27/(10*4) = 1.35 → 1.0
    val d = ((0L until 64L).map(i => (i, "x", "a")) ++ (100L until 104L).map(i => (i, "x", "b")))
      .toDF("doc_id", "text", "source")
    val kept = Layout.temperatureSample(d, "doc_id", "source", 2, 5)
      .as[(Long, String)].collect().toMap
    assert((100L until 104L).forall(kept.contains), "boosted source must be kept whole")
    // independent reference for the damped source: md5 60-bit unit < rate
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex60(id: Long): BigInt = {
      val h = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(h.substring(0, 15), 16)
    }
    val rateA = (8.0 * 27).toDouble / (10 * 64)
    val expectA = (0L until 64L).filter(i =>
      hex60(i).toDouble < rateA * 1152921504606846976.0).toSet
    assert(kept.keySet.filter(_ < 100L) === expectA)
  }

  test("url canonicalization: case, default ports, utm, fragment, slash") {
    val cases = Seq(
      ("HTTPS://Example.COM:443/Page/7/?utm_source=a#f", "https://example.com/Page/7"),
      ("HTTP://Host.COM:80/A/b/", "http://host.com/A/b"),
      ("https://h.com:8443/x", "https://h.com:8443/x"), // non-default port kept
      ("https://h.com/x?id=1", "https://h.com/x?id=1"), // non-utm query kept
      ("ftp://H.com:443/X#f", "ftp://h.com:443/X"), // :443 only stripped for https
      ("https://h.com", "https://h.com"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.operators.Urls.canonicalize(col("url")))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("leak-free split: every cluster lands in exactly one split") {
    val d = docs(
      0L -> "dup text one two three four five six",
      1L -> "dup text one two three four five six",
      2L -> "another document body entirely different words",
      3L -> "another document body entirely different words",
      4L -> "a third unrelated corpus entry with its own tokens")
    val out = Layout.leakFreeSplit(d, "doc_id", "text", maxDist = 3)
    val splitsPerCluster = out.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(splitsPerCluster === 1L)
    assert(out.count() === 5)
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // identical texts share a cluster, so they must share a split
    val bySplit = out.filter(col("doc_id").isin(0L, 1L))
      .select("split").distinct().count()
    assert(bySplit === 1L)
  }

  test("mixture rates: starved source reports capped rate + deficit; zero-token guard never NULLs") {
    val d = Seq(
      (0L, "alpha beta gamma delta", "rich"),
      (1L, "epsilon zeta eta theta", "rich"),
      // whitespace-only text tokenizes to [""] (size 1) under the
      // engine's split-on-\s+ tokenizer — pinned here because the
      // rate_permille DIV guard assumes n_tokens ≥ n_docs > 0 for any
      // source that emits a row; the when(n_tokens === 0, 0) branch is
      // defense-in-depth for future tokenizers, and least() must never
      // see a NULL quotient
      (2L, "", "empty"),
      (3L, "   ", "empty"))
      .toDF("doc_id", "text", "source")
    val out = Layout.mixtureRates(d, "doc_id", "text", "source",
        targets = Map("rich" -> 50, "empty" -> 50), defaultPct = 0, tokenBudget = 100L)
      .orderBy("source")
      .select("source", "n_tokens", "target_tokens", "rate_permille", "deficit")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("empty", 2L, 50L, 1000L, 48L),
      ("rich", 8L, 50L, 1000L, 42L)))
    assert(!out.exists(_ == null))
  }
}
