package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform

import graft.functions.TextFunctions._

/** Document deduplication operators for training-data pipelines: exact
  * (hash groupBy), MinHash+LSH banding, n-gram Jaccard, SimHash.
  *
  * Scale design (the local tests run at 500-5k docs; the operators are
  * written for 10^9+):
  *   - Exact dedup shuffles on a 128-bit content hash, never on the full
  *     text (shuffle payload is the hash + id, not the document).
  *   - Every set-similarity operator starts from ONE narrow typed pass
  *     that reduces each document to a compact row — sorted 64-bit
  *     shingle-hash set, minhash signature, simhash — inside the scan
  *     task. Documents are processed where they are read: the
  *     tokenize+hash work (the dominant cost) never shuffles, and the
  *     only rows that ever move are hashes and signatures.
  *   - MinHash: zero aggregation shuffles (the signature is folded per
  *     document in the scan task); one shuffle of band rows on
  *     (band, bucket); candidate verification happens in-bucket against
  *     the carried hash sets — the all-pairs O(n²) never materializes.
  *   - n-gram Jaccard is the exact baseline: ppjoin prefix filtering
  *     with in-kernel verification; the document-frequency table rides a
  *     broadcast when it fits and degrades to an equi-join + regroup at
  *     corpus scale.
  *   - SimHash: near-pair search uses the pigeonhole band trick
  *     (hamming ≤ d pairs share one of d+1 signature chunks) over
  *     DISTINCT signatures, not an all-pairs cross join.
  */
object Dedup {

  /** Exact duplicate groups by content hash: keeper = min id per group.
    * Ref analog: frames_list dedup `smpp_ingestor.py:330-339`. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------- shared

  /** 64-bit xxHash of a UTF-8 string — the internal shingle identity.
    * Never surfaced in results (set cardinalities and intersections are
    * hash-invariant, collision probability ~n²/2^64). */
  private[graft] def hash64(s: String): Long = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  /** [[hash64]] under an explicit seed — the second half of a 128-bit
    * identity (e.g. SpanDedup's `wideHash`). */
  private[graft] def hash64Seeded(s: String, seed: Long): Long = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  /** Whitespace tokenization shared by every parity-critical typed
    * kernel (shingles, windows, bigrams, simhash): `trim().split("\\s+")`
    * — the exact counterpart of the oracle's
    * `string_split_regex(trim(text), '\s+')`. ONE definition so a
    * future tokenization change cannot silently diverge the operators
    * from each other (and from the oracles, which would surface as a
    * hash mismatch). */
  private[graft] def wsTokens(text: String): Array[String] = text.trim.split("\\s+")

  /** Distinct word n-gram shingles of a document, in first-occurrence
    * order. Tokenization matches the oracle exactly ([[wsTokens]]);
    * fewer than n tokens → empty set. */
  private def distinctShingles(text: String, n: Int): java.util.LinkedHashSet[String] = {
    val toks = wsTokens(text)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  /** Narrow (id, text) source with small-split fanout: a corpus arriving
    * as fewer splits than cores (single-row-group parquet in the local
    * harness) would serialize the tokenize+hash stage on one task. At
    * real scale inputs arrive in thousands of splits and this is a
    * no-op. */
  private def fannedOut(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val narrow = docs.select(col(idCol).cast("long"), col(textCol))
    if (narrow.rdd.getNumPartitions < target) narrow.repartition(target) else narrow
  }

  /** Per-document sorted shingle-hash set, computed entirely inside the
    * scan task — no shuffle, one tokenize+hash pass, one compact row
    * (~8·|set| bytes) per document. Documents with fewer than n tokens
    * produce no row (they have no set to compare). */
  def docsetRows(docs: DataFrame, idCol: String, textCol: String, n: Int): Dataset[(Long, Array[Long])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    fannedOut(docs, idCol, textCol).as[(Long, String)]
      .flatMap { case (sid, text) =>
        val seen = distinctShingles(text, n)
        if (seen.isEmpty) Iterator.empty
        else {
          val gs = new Array[Long](seen.size)
          var i = 0
          val it = seen.iterator()
          while (it.hasNext) { gs(i) = hash64(it.next()); i += 1 }
          java.util.Arrays.sort(gs)
          Iterator.single((sid, gs))
        }
      }
  }

  /** Distinct (id, shingle) pairs — the set representation for Jaccard.
    * Linear, no shuffle, and the output is already distinct (per-doc
    * dedup happens in the flatMap). Kept as the string-shingle surface;
    * the similarity kernels use [[docsetRows]] (hashes) instead. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fannedOut(docs, idCol, textCol).as[(Long, String)]
      .flatMap { case (sid, text) =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(distinctShingles(text, n).iterator())
          .asScala.map(g => (sid, g))
      }
      .toDF("sid", "g")
  }

  /** Document-frequency entries above this count ride a shuffle join
    * instead of a broadcast: 1M (g, df) pairs ≈ 16 MB serialized, the
    * scale at which Spark's own dimension-broadcast heuristics live. A
    * 100 TB corpus has ~10^10 distinct shingles and always takes the
    * join path; the broadcast path is the toy-to-mid-scale fast lane
    * (one less shuffle of the widest dataset and no per-doc regroup). */
  private val MaxDfBroadcastEntries = 1000000

  /** Exact pairwise n-gram Jaccard with prefix filtering (ppjoin-style):
    * J(A,B) ≥ τ implies |A∩B| ≥ ceil(τ·|A|), so B must share at least one
    * of A's first `|A| - ceil(τ·|A|) + 1` shingles under a global
    * rarest-first order. The inverted-index kernel therefore runs only on
    * per-document prefixes (rare shingles), collapsing the classic
    * high-df pair explosion; surviving pairs are verified with the full
    * intersection count *inside the kernel* (the index rows carry each
    * doc's sorted hash set — the Vernica/Carey/Li MapReduce ssjoin
    * layout), so only pairs with J ≥ τ are ever emitted from the stage.
    * A pure candidate prune — results are identical to the naive
    * quadratic join (which remains the DuckDB oracle formulation).
    *
    * Two extra prunes on top of round 3:
    *   - prefix elements with df = 1 are never indexed: a qualifying
    *     pair's shared prefix element has df ≥ 2 by definition, so df=1
    *     index rows could only ever form singleton buckets. Positions
    *     are still computed over the FULL rarest-first order, keeping
    *     the positional filter exact.
    *   - when the df ≥ 2 table fits [[MaxDfBroadcastEntries]], it is
    *     broadcast and the whole prefix computation happens inside the
    *     docset scan task (the Vernica distributed-cache design): the
    *     per-doc regroup shuffle disappears. Beyond that size the
    *     equi-join + `groupByKey(sid)` fallback keeps the operator
    *     corpus-scale-safe (every shuffle keyed on the shingle hash or
    *     the doc id — high cardinality, no skew past the prefix filter).
    *
    * The docset pass is pinned with `localCheckpoint`: one compact row
    * per document (~8·|set| bytes — 10⁹ docs ≈ 1 TB cluster-wide, a
    * few GB per executor under MEMORY_AND_DISK), consumed exactly
    * twice (df count, prefix emit). Re-running the tokenize+hash pass —
    * the dominant cost — would double it instead. RDD-level blocks, not
    * a CacheManager entry: reclaimed by the ContextCleaner when the
    * returned frame goes unreachable, so the `ngram_jaccard_pairs` TVF
    * cannot accumulate session cache entries (round-6; the prior
    * `persist` relied on callers unpersisting, which a SQL caller
    * can't). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    ngramJaccardPairsBounded(docs, idCol, textCol, n, threshold, maxBucket,
      skippedAcc, MaxDfBroadcastEntries)

  /** [[ngramJaccardPairs]] with an injectable broadcast bound — specs
    * force the equi-join + groupByKey degrade path on small corpora
    * through it and hash-match the two regimes against each other. */
  private[graft] def ngramJaccardPairsBounded(docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double, maxBucket: Int,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator],
      maxDfBroadcast: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val skipped = skippedAcc.getOrElse(spark.sparkContext.longAccumulator(SkippedBucketsAcc))
    val ds = docsetRows(docs, idCol, textCol, n).localCheckpoint()
    // document frequency: partial-aggregated groupBy over the exploded
    // hash arrays — the strings are gone before the first shuffle, and
    // the explode is the codegen'd expression, not a typed lambda (the
    // lambda path pays an object ser/deser per shingle)
    val dft = ds.select(explode(col("_2")).as("g")).groupBy(col("g")).agg(count(lit(1)).as("df"))
    val matchable = dft.filter(col("df") >= 2)
    val probe = matchable.limit(maxDfBroadcast + 1).collect()

    def prefixBound(sz: Int): Int =
      // clamp: τ = 0 makes ceil(τ·sz) = 0 and the prefix bound sz + 1,
      // which would index past the end — a degenerate threshold means
      // every shingle is prefix
      math.min(sz - math.ceil(threshold * sz).toInt + 1, sz)

    // each index row additionally carries the doc's INDEXED prefix
    // hashes (ascending): the kernel emits a pair only in the bucket of
    // the pair's smallest shared indexed-prefix hash, so every true
    // pair leaves the stage exactly once and no output `distinct()`
    // exchange+sort is needed (the ppjoin canonical-bucket rule). The
    // extra payload is the ~(1-τ)·|set| prefix slice on rows that
    // already carry the full set.
    val prefix: Dataset[(Long, Long, Int, Int, Array[Long], Array[Long])] =
      if (probe.length <= maxDfBroadcast) {
        val dfm = new scala.collection.mutable.LongMap[Long](math.max(probe.length * 2, 16))
        probe.foreach(r => dfm.update(r.getLong(0), r.getLong(1)))
        val bc = spark.sparkContext.broadcast(dfm)
        ds.mapPartitions { it =>
          val m = bc.value
          it.flatMap { case (sid, gs) =>
            val sz = gs.length
            val keep = prefixBound(sz)
            // gs is ascending; a stable sort on df alone yields the
            // global (df, g) rarest-first order
            val ordered = Array.tabulate(sz)(i => (m.getOrElse(gs(i), 1L), gs(i))).sortBy(_._1)
            val idx = Iterator.range(0, keep)
              .filter(i => ordered(i)._1 >= 2)
              .map(i => (ordered(i)._2, i + 1)).toArray
            val pfx = idx.map(_._1); java.util.Arrays.sort(pfx)
            idx.iterator.map { case (g, pos) => (g, sid, pos, sz, gs, pfx) }
          }
        }
      } else {
        val sh = ds.select(col("_1").as("sid"), explode(col("_2")).as("g"))
        sh.join(dft, "g")
          .select(col("sid"), col("g"), col("df"))
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (sid, it) =>
            val rows = it.toArray.sortBy(r => (r._3, r._2))
            val sz = rows.length
            val keep = prefixBound(sz)
            val set = rows.map(_._2); java.util.Arrays.sort(set)
            val idx = Iterator.range(0, keep)
              .filter(i => rows(i)._3 >= 2)
              .map(i => (rows(i)._2, i + 1)).toArray
            val pfx = idx.map(_._1); java.util.Arrays.sort(pfx)
            idx.iterator.map { case (g, pos) => (g, sid, pos, sz, set, pfx) }
          }
      }
    // the ppjoin kernel: per shared prefix shingle, length + positional
    // filters (exact — every bound over-estimates the true intersection:
    //  - length: J ≥ τ forces τ·max(|A|,|B|) ≤ min(|A|,|B|);
    //  - positional: a common token at rarest-first positions (pa, pb)
    //    bounds the intersection by min(pa,pb) + min(|A|-pa, |B|-pb),
    //    and J ≥ τ needs inter·(1+τ) ≥ τ·(|A|+|B|))
    // then the canonical-bucket rule — the pair is emitted only when
    // THIS bucket's shingle is the smallest hash the two indexed
    // prefixes share (both prefixes contain the bucket key, so the
    // minimum always exists and exactly one bucket wins) — and a
    // sorted-merge intersection verifies the single survivor in place.
    //
    // The grouping is an explicit repartition-by-g + partition-local
    // sort + consecutive-run walk, NOT `groupByKey(_._1)`: same shuffle
    // volume, but (a) no AppendColumns pass (g is already a column) and
    // (b) the reduce width is OURS to choose — the df ≥ 2 table size
    // (already on the driver) guards it, so the toy/mid-scale regime
    // runs a handful of tasks instead of paying the 32-task scheduling
    // floor (the measured t5 residual), while the join-path regime keeps
    // full session parallelism.
    // probe.length is TRUNCATED at MaxDfBroadcastEntries + 1, so past
    // the broadcast cap it cannot size the reduce — the large-corpus
    // join-path regime takes full session parallelism outright (sizing
    // from the truncated count capped the most skew-sensitive stage at
    // ~41 tasks no matter the session width)
    val kernelParts =
      if (probe.length > maxDfBroadcast)
        spark.sessionState.conf.numShufflePartitions
      else math.max(1, math.min(
        spark.sessionState.conf.numShufflePartitions,
        probe.length / 25000 + 1))
    prefix
      .repartition(kernelParts, col("_1"))
      .sortWithinPartitions(col("_1"))
      .mapPartitions { rows0 =>
        val rows = rows0.buffered
        new Iterator[(Long, Long, Double)] {
          private var pending: Iterator[(Long, Long, Double)] = Iterator.empty
          private def advance(): Unit =
            while (!pending.hasNext && rows.hasNext) {
              val g = rows.head._1
              val grp = scala.collection.mutable.ArrayBuffer.empty[
                (Long, Long, Int, Int, Array[Long], Array[Long])]
              // same skew guard as the minhash kernels: buffer at most
              // cap+1 rows of the run, skip (and count) an over-cap group
              while (rows.hasNext && rows.head._1 == g) {
                val r = rows.next()
                if (grp.length <= maxBucket) grp += r
              }
              if (grp.length > maxBucket) skipped.add(1L)
              else pending = pairKernel(g, grp, threshold)
            }
          def hasNext: Boolean = { advance(); pending.hasNext }
          def next(): (Long, Long, Double) = { advance(); pending.next() }
        }
      }
      .toDF("da", "db", "jaccard")
  }

  /** The per-bucket ppjoin verify loop (see [[ngramJaccardPairs]]):
    * filters + canonical-bucket rule + in-place intersection. */
  private def pairKernel(g: Long,
      rows: scala.collection.IndexedSeq[(Long, Long, Int, Int, Array[Long], Array[Long])],
      threshold: Double): Iterator[(Long, Long, Double)] = {
    val out = Iterator.newBuilder[(Long, Long, Double)]
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val x = rows(i); val y = rows(j)
        val (a, b) = if (x._2 < y._2) (x, y) else (y, x)
        val (da, db, pa, pb, sa, sb) = (a._2, b._2, a._3, b._3, a._4, b._4)
        val ubound = math.min(pa, pb) + math.min(sa - pa, sb - pb)
        if (da != db && sa * threshold <= sb && sb * threshold <= sa
            && ubound * (1 + threshold) >= (sa + sb) * threshold
            && firstCommon(a._6, b._6) == g) {
          val inter = sortedIntersect(a._5, b._5)
          val jac = inter.toDouble / (sa + sb - inter)
          if (jac >= threshold) out += ((da, db, jac))
        }
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** First (smallest) element two ascending long arrays share;
    * Long.MinValue when disjoint. */
  private def firstCommon(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else return a(i)
    }
    Long.MinValue
  }

  /** Intersection size of two sorted long arrays (single merge pass). */
  private[operators] def sortedIntersect(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Per-document sorted shingle-hash sets — the verification dimension
    * table. Bounded by document length, so rows stay small even at 10⁹
    * docs, and the table broadcasts when the candidate side dwarfs it. */
  def docsetsOf(sh: DataFrame): DataFrame =
    sh.groupBy(col("sid")).agg(sort_array(collect_list(col("g"))).as("gs"))

  /** Exact Jaccard verification of candidate pairs: one array_intersect
    * over two row-sized arrays per pair, instead of an |A|+|B| row
    * explosion + re-aggregation. Emits (da, db, jaccard) ≥ τ. */
  def verifyJaccard(cand: DataFrame, docsets: DataFrame, threshold: Double): DataFrame =
    cand
      .join(docsets.as("xa"), col("da") === col("xa.sid"))
      .join(docsets.as("xb"), col("db") === col("xb.sid"))
      .select(col("da"), col("db"),
        size(array_intersect(col("xa.gs"), col("xb.gs"))).cast("long").as("inter"),
        size(col("xa.gs")).cast("long").as("sza"),
        size(col("xb.gs")).cast("long").as("szb"))
      .select(col("da"), col("db"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** MinHash permutation family, shared verbatim with the SQL oracle:
    * one md5 per shingle gives a 60-bit base value `x` (first 15 hex
    * chars), and the K permutations are `h_i = (a_i·x + b_i) mod p` with
    * p = 2³¹-1. Purely arithmetic after the single digest — 16× less
    * hashing than md5-per-(seed,shingle), same min-wise independence.
    * All intermediates fit signed 64-bit: a_i,x < p ⇒ a_i·x < 2⁶². */
  final val MinhashP = 2147483647L // 2^31 - 1, Mersenne prime
  def minhashA(i: Int): Long = (2654435761L * (i + 1)) % MinhashP
  def minhashB(i: Int): Long = (2654777351L * (i + 1) + 97531L) % MinhashP

  /** The 60-bit md5 base value for a shingle column (Spark side). The
    * oracle spells it `CAST('0x' || substring(md5(g),1,15) AS BIGINT)`. */
  def minhashBase(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long") % MinhashP

  /** The same 60-bit base value computed from raw md5 digest bytes: the
    * first 15 hex chars are the first 7.5 bytes, i.e. the big-endian
    * 8-byte value with the last nibble dropped. */
  private def minhashBaseOf(digest: Array[Byte]): Long = {
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (digest(i) & 0xffL); i += 1 }
    (be >>> 4) % MinhashP
  }

  /** MinHash signature (K values) per document from a pre-computed base
    * column `x`. */
  def minhashSignatures(shx: DataFrame, numHashes: Int): DataFrame = {
    def h(i: Int) = (lit(minhashA(i)) * col("x") + lit(minhashB(i))) % MinhashP
    shx.groupBy(col("sid"))
      .agg(min(h(0)).as("mh0"),
        (1 until numHashes).map(i => min(h(i)).as(s"mh$i")): _*)
  }

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard on
    * the candidate set. `numHashes = bands * rowsPerBand`.
    *
    * The whole signature is folded inside the scan task: one narrow pass
    * tokenizes, md5s each distinct shingle once, folds the K running
    * minima AND the sorted verification set per document, and emits the
    * `bands` band rows directly — no aggregation shuffle exists in the
    * plan at all. The only shuffle is the band rows on (band, bucket);
    * in-bucket pairs are verified with a sorted-merge intersection and
    * only J ≥ τ survivors leave the stage (no candidate↔set re-join, no
    * cache). Carrying the set costs bands× duplication through that one
    * shuffle; at single-digit band counts that undercuts the re-join,
    * and bucket population is bounded by LSH design so the per-group
    * loop stays small at any corpus size. A pair surviving in several
    * bands is emitted ONCE, by the canonical-band rule: each row
    * carries the document's full band-hash vector (`bands` longs —
    * noise next to the set it already carries), and the kernel emits a
    * pair only in the FIRST band where the two vectors agree — the
    * same trick that freed the ppjoin kernel of its output
    * `distinct()`, which here was a full exchange+sort over the
    * emitted pair set. */
  /** Per-document band rows — (band, bucket, sid, sorted hash set,
    * all-band hash vector) — computed entirely in-task: distinct
    * shingles, one md5 each feeding the K running minima, band buckets
    * folded through xxHash64 (bucket ids are internal join keys only,
    * never surfaced). Shared by the batch pair kernels and the
    * streaming near-dup operators (which ignore the vector — their
    * cross-batch dedup is state-based). `md` is the caller's
    * per-partition digest instance. */
  private[graft] def minhashBandRowsOf(sid: Long, text: String, n: Int,
      bands: Int, rowsPerBand: Int,
      md: MessageDigest): Iterator[(Int, Long, Long, Array[Long], Array[Long])] = {
    val k = bands * rowsPerBand
    val aArr = Array.tabulate(k)(minhashA)
    val bArr = Array.tabulate(k)(minhashB)
    val seen = distinctShingles(text, n)
    if (seen.isEmpty) Iterator.empty
    else {
      val gs = new Array[Long](seen.size)
      val mins = Array.fill(k)(Long.MaxValue)
      var idx = 0
      val it = seen.iterator()
      while (it.hasNext) {
        val s = it.next()
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        gs(idx) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        md.reset()
        val x = minhashBaseOf(md.digest(bytes))
        var i = 0
        while (i < k) {
          val h = (aArr(i) * x + bArr(i)) % MinhashP
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        idx += 1
      }
      java.util.Arrays.sort(gs)
      val bhs = Array.tabulate(bands) { b =>
        var h = 42L
        var r = 0
        while (r < rowsPerBand) { h = XXH64.hashLong(mins(b * rowsPerBand + r), h); r += 1 }
        h
      }
      Iterator.tabulate(bands)(b => (b, bhs(b), sid, gs, bhs))
    }
  }

  /** First band index at which two band-hash vectors agree — the
    * canonical band that owns the pair's single emission. The kernels
    * call it only for rows meeting in SOME bucket, so a match exists. */
  private[operators] def firstSharedBand(a: Array[Long], b: Array[Long]): Int = {
    var i = 0
    while (a(i) != b(i)) i += 1
    i
  }

  /** Name of the accumulator counting buckets dropped by a `maxBucket`
    * cap (visible per-job in the Spark UI) — the cap is never silent. */
  val SkippedBucketsAcc = "graft.lsh.skippedBuckets"

  /** Materialize one LSH bucket up to `maxBucket` rows; null (counted)
    * when the bucket exceeds the cap. A mega-bucket — millions of
    * near-identical boilerplate docs sharing a band hash — makes the
    * in-bucket verify quadratic INSIDE ONE TASK, the skew cliff of any
    * bucketed pair kernel at corpus scale. Pairs a cap drops are
    * intra-mega-cluster near-dups, exactly what exact dedup (run first
    * in the curation chain) collapses more cheaply; the cap bounds both
    * compute and the task's heap (the bucket is never fully buffered). */
  private[operators] def cappedBucket[T: scala.reflect.ClassTag](it: Iterator[T],
      maxBucket: Int,
      skipped: org.apache.spark.util.LongAccumulator): Array[T] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    while (it.hasNext && buf.length <= maxBucket) buf += it.next()
    if (buf.length > maxBucket) { skipped.add(1L); null }
    else buf.toArray
  }

  /** `maxBucket` (default: uncapped) skips buckets larger than the cap —
    * see [[cappedBucket]]; skipped buckets are counted in the
    * [[SkippedBucketsAcc]] accumulator. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val skipped = skippedAcc.getOrElse(spark.sparkContext.longAccumulator(SkippedBucketsAcc))
    fannedOut(docs, idCol, textCol).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.flatMap { case (sid, text) =>
          minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
        }
      }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, it) =>
        val band = key._1
        val capped = cappedBucket(it, maxBucket, skipped)
        if (capped == null) Iterator.empty
        else {
        val rows = capped.sortBy(_._3)
        val out = Iterator.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < rows.length) {
          var j = i + 1
          while (j < rows.length) {
            val a = rows(i); val b = rows(j)
            // canonical-band rule: only the first band the two vectors
            // share emits the pair — exactly one bucket wins, no output
            // distinct() needed
            if (a._3 != b._3 && firstSharedBand(a._5, b._5) == band) {
              val inter = sortedIntersect(a._4, b._4)
              val jac = inter.toDouble / (a._4.length + b._4.length - inter)
              if (jac >= threshold) out += ((a._3, b._3, jac))
            }
            j += 1
          }
          i += 1
        }
        out.result()
        }
      }
      .toDF("da", "db", "jaccard")
  }

  /** Cross-corpus (incremental) near-dup: which NEW documents are
    * near-duplicates of the EXISTING reference corpus — the ingestion
    * gate a live training pipeline runs on every incoming batch. Same
    * banding + in-bucket verification as [[minhashLshPairs]], but the
    * kernel pairs only across the corpus boundary: new×new and ref×ref
    * pairs are never formed, so a small batch against a huge reference
    * costs the batch's bucket probes, not the reference's self-join.
    * At a standing deployment the reference band rows are a persisted
    * index; here both sides are computed by the shared scan kernel.
    * Emits (da = new id, db = reference id, jaccard ≥ τ), each pair
    * exactly once via the canonical-band rule. */
  def minhashLshPairsAcross(newDocs: DataFrame, refDocs: DataFrame,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    def bandRows(docs: DataFrame, isNew: Boolean) =
      fannedOut(docs, idCol, textCol).as[(Long, String)]
        .mapPartitions { rows =>
          val md = MessageDigest.getInstance("MD5")
          rows.flatMap { case (sid, text) =>
            minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
              .map(r => (r._1, r._2, r._3, r._4, r._5, isNew))
          }
        }
    acrossPairs(bandRows(newDocs, isNew = true)
      .unionAll(bandRows(refDocs, isNew = false)), threshold, maxBucket, skippedAcc)
  }

  /** Shared pairing stage of the cross-corpus kernels: one shuffle on
    * (band, bucket), boundary-only pairing (new×new / ref×ref never
    * form), canonical-band single emission. */
  private[operators] def acrossPairs(
      rows: Dataset[(Int, Long, Long, Array[Long], Array[Long], Boolean)],
      threshold: Double, maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val skipped = skippedAcc.getOrElse(spark.sparkContext.longAccumulator(SkippedBucketsAcc))
    rows
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, it) =>
        val band = key._1
        val capped = cappedBucket(it, maxBucket, skipped)
        if (capped == null) Iterator.empty
        else {
        val (news, refs) = capped.partition(_._6)
        val out = Iterator.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < news.length) {
          var j = 0
          while (j < refs.length) {
            val a = news(i); val b = refs(j)
            // overlapping corpora: a doc present on both sides is not a
            // near-dup of itself (same guard as the symmetric kernel);
            // canonical-band rule as in the symmetric kernel — one
            // bucket owns the pair, no output distinct()
            if (a._3 != b._3 && firstSharedBand(a._5, b._5) == band) {
              val inter = sortedIntersect(a._4, b._4)
              val jac = inter.toDouble / (a._4.length + b._4.length - inter)
              if (jac >= threshold) out += ((a._3, b._3, jac))
            }
            j += 1
          }
          i += 1
        }
        out.result()
        }
      }
      .toDF("da", "db", "jaccard")
  }

  /** The reference corpus's minhash doc index as a storable frame —
    * the BUILD-ONCE half of the incremental-dedup deployment split
    * (mirrors [[graft.operators.Ann.assignCells]] for IVF): compute the
    * shingle sets, minhash signatures and band-hash vectors of the
    * standing corpus ONCE, write them out, and every incoming batch
    * probes the persisted index instead of re-tokenizing and re-hashing
    * 100 TB of reference text per batch. ONE row per document —
    * (sid, gs, bhs), ~8·|shingle set| bytes plus 8·bands — never the
    * text and never the per-band duplication of gs (band rows fan back
    * out from `bhs` at probe time with a trivial flatMap; the expensive
    * tokenize + md5 + minhash work is exactly what the index
    * memoizes). */
  def minhashDocIndex(refDocs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val spark = refDocs.sparkSession
    import spark.implicits._
    fannedOut(refDocs, idCol, textCol).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.flatMap { case (sid, text) =>
          // first band row carries the doc's full gs + bhs
          minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
            .take(1).map(r => (r._3, r._4, r._5))
        }
      }
      .toDF("sid", "gs", "bhs")
  }

  /** The PROBE half: [[minhashLshPairsAcross]] against a pre-built
    * reference index ([[minhashDocIndex]]'s output, typically read
    * back from parquet). Only the incoming batch pays the tokenize +
    * minhash scan; the reference side is a column-pruned read of the
    * persisted doc rows fanned back out to band rows (bucket = bhs(b),
    * the same value [[minhashBandRowsOf]] assigns). Identical output to
    * the recompute-both-sides kernel — same boundary-only pairing, same
    * canonical-band single emission. */
  def minhashLshPairsAcrossIndexed(newDocs: DataFrame, refIndex: DataFrame,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val newRows = fannedOut(newDocs, idCol, textCol).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.flatMap { case (sid, text) =>
          minhashBandRowsOf(sid, text, n, bands, rowsPerBand, md)
            .map(r => (r._1, r._2, r._3, r._4, r._5, true))
        }
      }
    acrossPairs(newRows.unionAll(indexBandRows(refIndex, bands, isNew = false)),
      threshold, maxBucket, skippedAcc)
  }

  /** Band rows fanned back out from persisted [[minhashDocIndex]] rows —
    * bucket = bhs(b), the same value [[minhashBandRowsOf]] assigns, so
    * index-derived and text-derived rows bucket identically. */
  private[operators] def indexBandRows(index: DataFrame, bands: Int,
      isNew: Boolean): Dataset[(Int, Long, Long, Array[Long], Array[Long], Boolean)] = {
    val spark = index.sparkSession
    import spark.implicits._
    index.select(col("sid"), col("gs"), col("bhs"))
      .as[(Long, Array[Long], Array[Long])]
      .flatMap { case (sid, gs, bhs) =>
        Iterator.tabulate(bands)(b => (b, bhs(b), sid, gs, bhs, isNew))
      }
  }

  /** Result of one index-admission tick: per-batch-doc verdicts and the
    * standing index with the admitted docs appended. */
  final case class IndexAdmission(decisions: DataFrame, updatedIndex: DataFrame)

  /** The UPDATE step of the standing-index lifecycle
    * ([[minhashDocIndex]] builds, [[minhashLshPairsAcrossIndexed]]
    * serves, this admits): gate an incoming batch against the standing
    * corpus index, ADMIT every batch doc with no qualifying near-dup in
    * the reference, and return the updated index with the admitted
    * docs' signature rows appended — ready to be persisted for the next
    * ingest tick. This is the loop a live curation pipeline runs on
    * every arriving shard; without it the "standing" index is frozen at
    * build time and later batches silently stop deduplicating against
    * each other.
    *
    * Cost model at 100 TB: the batch pays its tokenize+minhash scan
    * ONCE ([[minhashDocIndex]], pinned with `localCheckpoint` — it is
    * consumed by both the gate probe and the admitted-subset union);
    * the reference side is a column-pruned read of compact signature
    * rows; the index grows by |admitted| rows per tick (append-only —
    * at deployment, write the admitted rows as a new parquet file
    * rather than rewriting the index). Batch-INTERNAL duplicates are
    * not this operator's job (both copies of a pair new to the corpus
    * are admitted): run the symmetric [[minhashLshPairs]] kernel within
    * the batch first, exactly as a pipeline runs exact dedup before the
    * cross-corpus gate.
    *
    * `decisions` = (sid, admitted, n_ref_matches) per batch doc;
    * `updatedIndex` = refIndex ∪ admitted docs' (sid, gs, bhs) rows.
    * Documents with fewer than `n` tokens have no shingle set, hence no
    * index row and NO verdict — the minhash family's totality
    * convention ([[docsetRows]]); a pipeline that must keep them routes
    * them around the gate (they cannot near-dup anything).
    *
    * Id-space contract: batch sids are expected DISJOINT from the
    * index's (a replayed/overlapping shard is an upstream exactly-once
    * problem, not a near-dup question — the pair kernel's same-id guard
    * deliberately never compares a doc to itself). The union still
    * DEFENDS against a violation: admitted rows are anti-joined against
    * the index's sids, so a replayed doc can never plant a duplicate
    * signature row that would emit duplicate band rows — and duplicated
    * pairs — on every later tick; its verdict row likewise reports
    * admitted=false (0 ref matches — the same-id guard saw nothing),
    * so decisions and the returned index always agree. */
  def minhashIndexAdmit(refIndex: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): IndexAdmission = {
    val batchIndex =
      minhashDocIndex(newDocs, idCol, textCol, n, bands, rowsPerBand)
        .localCheckpoint()
    val gate = acrossPairs(
      indexBandRows(batchIndex, bands, isNew = true)
        .unionAll(indexBandRows(refIndex, bands, isNew = false)),
      threshold, maxBucket, skippedAcc)
    val matches = gate.groupBy(col("da").as("sid"))
      .agg(count(lit(1)).as("n_ref_matches"))
    // a replayed sid (already in the index — precondition violation,
    // see scaladoc) pairs with nothing through the same-id guard, so
    // its ref-match count is 0; the verdict must still be
    // admitted=false, or decisions would disagree with the index union
    // below and a caller keeping "admitted" docs would double-ingest it
    val replayed = refIndex.select(col("sid")).distinct()
      .withColumn("replayed", lit(true))
    val decisions = batchIndex.select(col("sid"))
      .join(matches, Seq("sid"), "left")
      .join(replayed, Seq("sid"), "left")
      .select(col("sid"),
        (col("n_ref_matches").isNull && col("replayed").isNull).as("admitted"),
        coalesce(col("n_ref_matches"), lit(0L)).as("n_ref_matches"))
    val admittedRows = batchIndex.join(
        gate.select(col("da").as("sid")).distinct(), Seq("sid"), "left_anti")
      // defend the disjoint-id precondition (scaladoc): a batch sid
      // already present in the index pairs with nothing (same-id
      // guard), so without this anti-join a replayed doc would union a
      // SECOND signature row under its sid
      .join(refIndex.select(col("sid")), Seq("sid"), "left_anti")
    IndexAdmission(decisions,
      refIndex.select(col("sid"), col("gs"), col("bhs")).unionByName(admittedRows))
  }

  /** SimHash near-neighbor stats via the pigeonhole band trick (the
    * documented scale path for the t7 signatures, now a query): two
    * 16-bit signatures within Hamming distance d must agree EXACTLY on
    * at least one of d+1 disjoint bit chunks, so grouping by
    * (chunk index, chunk value) covers every qualifying pair without an
    * all-pairs join; the in-bucket check is the exact popcount.
    *
    * Coarse signatures collapse a large corpus onto few distinct values
    * (≤ 2¹⁶ here), so the kernel runs over DISTINCT signatures with
    * multiplicities — the doc-level pair explosion (quadratic in cluster
    * size, millions of pairs on a template-heavy corpus) never
    * materializes. Emits per-document (sid, n_near, min_hamming) for
    * docs with ≥ 1 neighbor within `maxDist`: exactly the rollup of the
    * naive all-pairs popcount join. Wider signatures at corpus scale
    * widen the chunks (64/(d+1) bits), keeping bucket populations
    * bounded.
    *
    * The per-doc signature frame (16 bytes/doc) is pinned with
    * `localCheckpoint`: it is consumed twice (multiplicity count +
    * final rollup probe) and since the typed signature pass is narrow
    * there is no exchange for ReuseExchange to share — re-running it
    * would double the dominant md5-per-token cost. RDD-level blocks,
    * ContextCleaner-reclaimed — no CacheManager entry for the
    * `simhash_near` TVF to leak (round 6). The per-signature stats
    * table (≤ 2¹⁶ rows) is broadcast back, so the probe side never
    * shuffles. */
  /** Signature-level near pairs for Hamming ≤ maxDist via the exact
    * pigeonhole chunk cover: 16 bits cut into maxDist+1 chunks, two
    * signatures within maxDist must agree on ≥ 1 chunk, so candidates
    * meet in an equi-keyed (chunk, value) group and are popcount-checked
    * there. Input is one row per DISTINCT signature (column `simhash`);
    * output is both directions, columns (s, o, ham). Runs over ≤ 2¹⁶
    * distinct values regardless of corpus size — the doc-level pair
    * explosion is never materialized. A pair agreeing on several chunks
    * is emitted once, by the canonical-chunk rule (both full signatures
    * are in hand, so the first agreeing chunk is a popcount-cheap
    * inline check) — no output distinct() exchange. */
  def simhashSigPairs(distinctSigs: DataFrame, maxDist: Int): DataFrame = {
    val spark = distinctSigs.sparkSession
    import spark.implicits._
    val chunks = maxDist + 1
    val bitsPer = 16 / chunks
    val mask = (1L << bitsPer) - 1
    distinctSigs.select(col("simhash")).as[Long]
      .flatMap { sig =>
        (0 until chunks).map(c => (c, (sig >> (c * bitsPer)) & mask, sig))
      }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, it) =>
        val chunk = key._1
        val ss = it.map(_._3).toArray.sorted
        def firstSharedChunk(a: Long, b: Long): Int = {
          var c = 0
          while (((a >> (c * bitsPer)) & mask) != ((b >> (c * bitsPer)) & mask)) c += 1
          c
        }
        val out = Iterator.newBuilder[(Long, Long, Long)]
        var i = 0
        while (i < ss.length) {
          var j = i + 1
          while (j < ss.length) {
            val ham = java.lang.Long.bitCount(ss(i) ^ ss(j))
            if (ham <= maxDist && ss(i) != ss(j)
                && firstSharedChunk(ss(i), ss(j)) == chunk) {
              out += ((ss(i), ss(j), ham.toLong))
              out += ((ss(j), ss(i), ham.toLong))
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("s", "o", "ham")
  }

  def simhashNearStats(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = simhashSignatures(docs, idCol, textCol).localCheckpoint()
    val counts = sigs.groupBy(col("simhash")).agg(count(lit(1)).as("n"))
    val sigPairs = simhashSigPairs(counts.select(col("simhash")), maxDist)
    // neighbors from OTHER signatures: weight by the other side's count
    val fromOthers = sigPairs
      .join(counts.select(col("simhash").as("o"), col("n").as("n_o")), "o")
      .groupBy(col("s"))
      .agg(sum(col("n_o")).as("n_other"), min(col("ham")).as("min_other"))
    // combine with the same-signature contribution (n-1 docs at ham 0)
    val perSig = counts
      .join(fromOthers, col("simhash") === col("s"), "left")
      .select(col("simhash"),
        (coalesce(col("n_other"), lit(0L)) + col("n") - 1).as("n_near"),
        when(col("n") >= 2, lit(0L)).otherwise(col("min_other")).as("min_hamming"))
    sigs.join(broadcast(perSig), "simhash")
      .filter(col("n_near") > 0)
      .select(col("sid"), col("n_near"), col("min_hamming"))
  }

  /** 16-bit SimHash signature per document over its distinct tokens.
    *
    * One narrow typed pass: per document, each distinct token contributes
    * ±1 to each of the 16 bit sums via md5(`"<i>#" + token`) — bit i is
    * +1 iff the digest's first hex char is in '0'..'7', i.e. the high
    * bit of the first byte is 0, matching
    * [[graft.functions.TextFunctions.simhashContrib]] and the oracle's
    * `substring(md5(...),1,1) IN ('0'..'7')` verbatim. Folding the sums
    * in the scan task replaces the round-3 explode (one row per
    * (doc, token)) + 16-column hash aggregate + exchange: the 16 md5s
    * per token are the irreducible cost and now they are the ONLY
    * cost. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fannedOut(docs, idCol, textCol).as[(Long, String)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.map { case (sid, text) =>
          // tokenSet parity: wsTokens then distinct — an empty document
          // yields the single token "" here too
          val toks = wsTokens(text)
          val seen = new java.util.LinkedHashSet[String]()
          var t = 0
          while (t < toks.length) { seen.add(toks(t)); t += 1 }
          val sums = new Array[Int](16)
          val it = seen.iterator()
          while (it.hasNext) {
            val tok = it.next()
            var i = 0
            while (i < 16) {
              md.reset()
              val dg = md.digest((i.toString + "#" + tok).getBytes(StandardCharsets.UTF_8))
              if ((dg(0) & 0x80) == 0) sums(i) += 1 else sums(i) -= 1
              i += 1
            }
          }
          var sig = 0L
          var i = 0
          while (i < 16) { if (sums(i) >= 0) sig |= (1L << i); i += 1 }
          (sid, sig)
        }
      }
      .toDF("sid", "simhash")
  }

}
