package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication operators for training-data pipelines: exact
  * (hash groupBy), MinHash+LSH banding, n-gram Jaccard, SimHash.
  *
  * Scale design (the local tests run at 500-5k docs; the operators are
  * written for 10^9+):
  *   - Exact dedup shuffles on a 128-bit content hash, never on the full
  *     text (shuffle payload is the hash + id, not the document).
  *   - MinHash: one shuffle to distinct (id, shingle), one aggregation to
  *     the K-value signature, one shuffle on (band, bucket). Candidate
  *     verification joins only the *candidate* ids back to shingle sets —
  *     the all-pairs O(n²) never materializes.
  *   - n-gram Jaccard is the exact (quadratic-in-collisions) baseline;
  *     its shingle-inverted-index join is the classic bottleneck that
  *     MinHash-LSH replaces at scale — kept as the correctness oracle.
  *   - SimHash: signature is a single aggregation; near-pair search uses
  *     the pigeonhole band trick (hamming ≤ d pairs share one of d+1
  *     signature chunks), not an all-pairs cross join.
  */
object Dedup {

  /** Exact duplicate groups by content hash: keeper = min id per group.
    * Ref analog: frames_list dedup `smpp_ingestor.py:330-339`. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs — the set representation for Jaccard.
    *
    * Typed flatMap with per-document dedup (the documented
    * mapPartitions-last-resort case, SURVEY §2.11): linear, no shuffle at
    * all, and the output is already distinct. The Column-lambda form
    * (`TextFunctions.shingles`) re-evaluates referenced subexpressions
    * per element — O(tokens²) per document, measured 9s just to shingle
    * 5k docs — and a window-`lead` formulation pays a full shuffle on the
    * doc id. Tokenization matches the oracle exactly:
    * `trim().split("\\s+")`. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // small-split fanout: a corpus arriving as fewer splits than cores
    // (single-row-group parquet in the local harness) would serialize the
    // tokenize+hash stage on one task. At real scale inputs arrive in
    // thousands of splits and this is a no-op.
    val target = spark.sparkContext.defaultParallelism
    val narrow = docs.select(col(idCol).cast("long"), col(textCol))
    val src = if (narrow.rdd.getNumPartitions < target) narrow.repartition(target) else narrow
    src.as[(Long, String)]
      .flatMap { case (sid, text) =>
        val toks = text.trim.split("\\s+")
        if (toks.length < n) Iterator.empty
        else {
          // per-document dedup here makes (sid, g) already distinct —
          // no global distinct shuffle needed downstream
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i + n <= toks.length) {
            val sb = new java.lang.StringBuilder(toks(i))
            var j = 1
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            seen.add(sb.toString)
            i += 1
          }
          scala.jdk.CollectionConverters.IteratorHasAsScala(seen.iterator()).asScala
            .map(g => (sid, g))
        }
      }
      .toDF("sid", "g")
  }

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
    * Scale notes: every shuffle is keyed on the shingle hash or the doc
    * id (high cardinality, no skew past the prefix filter); carrying the
    * set in the index rows costs O(prefix·|set|) shuffle bytes per doc —
    * the published trade for skipping the candidate↔set re-join. For
    * very long documents (≫10⁴ shingles) prefer indexing against
    * [[docsetsOf]] + [[verifyJaccard]], which re-joins instead of
    * carrying. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // shingles shrink to 64-bit hashes immediately — set cardinalities
    // and intersections are hash-invariant (collision probability
    // ~n²/2^64, vanishing), no output column exposes the hash, and every
    // downstream shuffle carries longs, never strings
    // not cached: the tokenize+hash pass is consumed twice (df
    // aggregation + join probe) but re-running it measures cheaper than
    // materializing a cache, and at corpus scale an uncached narrow pass
    // beats pinning the full shingle set in executor memory
    val sh = shingleSet(docs, idCol, textCol, n)
      .select(col("sid"), xxhash64(col("g")).as("g"))
    // document frequency: partial-aggregated groupBy + equi-join (AQE
    // broadcasts it when small) — unlike a count().over(partitionBy(g))
    // window this map-side combines and never sorts the shingle rows
    val dft = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // one typed pass per doc: rarest-first (df, g) order, emit the first
    // sz - ceil(τ·sz) + 1 shingles as index rows, each carrying the
    // numerically-sorted full set for in-kernel verification. (A pure
    // expression formulation — collect_list(struct)+array_sort+slice+
    // posexplode — measured ~20% slower than this typed pass: the
    // ObjectHashAggregate struct collection outweighs the encoder cost.)
    val prefix = sh.join(dft, "g")
      .select(col("sid"), col("g"), col("df"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val rows = it.toArray.sortBy(r => (r._3, r._2))
        val sz = rows.length
        // clamp: τ = 0 makes ceil(τ·sz) = 0 and the prefix bound sz + 1,
        // which would index past the end — a degenerate threshold means
        // every shingle is prefix
        val keep = math.min(sz - math.ceil(threshold * sz).toInt + 1, sz)
        val set = rows.map(_._2); java.util.Arrays.sort(set)
        Iterator.tabulate(keep)(i => (rows(i)._2, sid, i + 1, sz, set))
      }
    // the ppjoin kernel: per shared prefix shingle, length + positional
    // filters (exact — every bound over-estimates the true intersection:
    //  - length: J ≥ τ forces τ·max(|A|,|B|) ≤ min(|A|,|B|);
    //  - positional: a common token at rarest-first positions (pa, pb)
    //    bounds the intersection by min(pa,pb) + min(|A|-pa, |B|-pb),
    //    and J ≥ τ needs inter·(1+τ) ≥ τ·(|A|+|B|))
    // then a sorted-merge intersection verifies survivors in place. The
    // same true pair can emerge from several shared prefix shingles with
    // identical (da, db, jaccard) values — distinct() collapses them.
    prefix.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
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
                && ubound * (1 + threshold) >= (sa + sb) * threshold) {
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
      .toDF("da", "db", "jaccard").distinct()
  }

  /** Intersection size of two sorted long arrays (single merge pass). */
  private def sortedIntersect(a: Array[Long], b: Array[Long]): Int = {
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

  /** MinHash signature (K values) per document from a pre-computed base
    * column `x`. */
  def minhashSignatures(shx: DataFrame, numHashes: Int): DataFrame = {
    def h(i: Int) = (lit(minhashA(i)) * col("x") + lit(minhashB(i))) % MinhashP
    shx.groupBy(col("sid"))
      .agg(min(h(0)).as("mh0"),
        (1 until numHashes).map(i => min(h(i)).as(s"mh$i")): _*)
  }

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard on
    * the candidate set. `numHashes = bands * rowsPerBand`. Shingle strings
    * are consumed in one narrow projection (md5 base + 64-bit join hash);
    * nothing wider than (long, long) or a row-sized array ever shuffles. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    // signature AND verification set in ONE per-doc aggregation: the
    // shingle rows are consumed in a single pass/shuffle. (Round 2
    // cached the full shingle row set and shuffled it twice.)
    val sh = shingleSet(docs, idCol, textCol, n)
      .select(col("sid"), xxhash64(col("g")).as("g"), minhashBase(col("g")).as("x"))
    def h(i: Int) = (lit(minhashA(i)) * col("x") + lit(minhashB(i))) % MinhashP
    val agg = sh.groupBy(col("sid"))
      .agg(sort_array(collect_list(col("g"))).as("gs"),
        (0 until k).map(i => min(h(i)).as(s"mh$i")): _*)
    // band buckets are internal join keys only (never surfaced), so the
    // cheap 64-bit xxhash64 replaces md5 without touching oracle parity
    val bucketCols = (0 until bands).map { b =>
      xxhash64(concat_ws(",", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
    }
    // fused bucket kernel (same layout as the ngram kernel): band rows
    // carry the doc's sorted set, pairs are verified in-bucket with a
    // sorted-merge intersection, and only J ≥ τ survivors are emitted —
    // no candidate↔set re-join, no cache, one shuffle of the band rows.
    // Carrying the set costs bands× duplication through the shuffle; at
    // single-digit band counts that undercuts the re-join, and bucket
    // population is bounded by LSH design so the per-group loop stays
    // small at any corpus size. The same pair surviving in several bands
    // emits identical (da, db, jaccard) rows — distinct() collapses them.
    agg.select(col("sid"), col("gs"),
        posexplode(array(bucketCols: _*)).as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("sid"), col("gs"))
      .as[(Int, Long, Long, Array[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._3)
        val out = Iterator.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < rows.length) {
          var j = i + 1
          while (j < rows.length) {
            val a = rows(i); val b = rows(j)
            if (a._3 != b._3) {
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
      .toDF("da", "db", "jaccard").distinct()
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
    * bounded. */
  def simhashNearStats(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = maxDist + 1
    val bitsPer = 16 / chunks
    val mask = (1L << bitsPer) - 1
    // (sid, simhash) is consumed twice (multiplicity count + final stats
    // join) but NOT cached: the signature subtree is pure-expression
    // (explode + partial-aggregated sums), so both consumers canonicalize
    // to the same exchange and ReuseExchange shares the expensive
    // md5-per-token map stage — without pinning executor memory for the
    // session lifetime the way a .cache() here would
    val sigs = simhashSignatures(docs, idCol, textCol)
    val counts = sigs.groupBy(col("simhash")).agg(count(lit(1)).as("n"))
    // pigeonhole kernel over distinct signatures; both directions out
    val sigPairs = counts.select(col("simhash")).as[Long]
      .flatMap { sig =>
        (0 until chunks).map(c => (c, (sig >> (c * bitsPer)) & mask, sig))
      }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_, it) =>
        val ss = it.map(_._3).toArray.sorted
        val out = Iterator.newBuilder[(Long, Long, Long)]
        var i = 0
        while (i < ss.length) {
          var j = i + 1
          while (j < ss.length) {
            val ham = java.lang.Long.bitCount(ss(i) ^ ss(j))
            if (ham <= maxDist && ss(i) != ss(j)) {
              out += ((ss(i), ss(j), ham.toLong))
              out += ((ss(j), ss(i), ham.toLong))
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("s", "o", "ham").distinct()
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
    sigs.join(perSig, "simhash")
      .filter(col("n_near") > 0)
      .select(col("sid"), col("n_near"), col("min_hamming"))
  }

  /** 16-bit SimHash signature per document over its distinct tokens. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // same small-split fanout as shingleSet: the 16 md5s per token are
    // the dominant cost and must not run on a single scan task
    val spark = docs.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val narrow = docs.select(col(idCol).as("sid"), col(textCol).as("txt"))
    val src = if (narrow.rdd.getNumPartitions < target) narrow.repartition(target) else narrow
    val toks = src
      .select(col("sid"), explode(tokenSet(col("txt"))).as("t"))
    val bitSums = toks.groupBy(col("sid"))
      .agg(sum(simhashContrib(col("t"), 0)).as("s0"),
        (1 until 16).map(i => sum(simhashContrib(col("t"), i)).as(s"s$i")): _*)
    val sig = (0 until 16)
      .map(i => when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col("sid"), sig.as("simhash"))
  }

}
