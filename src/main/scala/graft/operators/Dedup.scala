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
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
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
    * rarest-first order. The inverted-index join therefore runs only on
    * per-document prefixes (rare shingles), collapsing the classic
    * high-df pair explosion; candidates are then verified with the full
    * intersection count. A pure candidate *prune* — results are
    * identical to the naive quadratic join (which remains the DuckDB
    * oracle formulation). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shingles shrink to 64-bit hashes for all internal joins/shuffles —
    // set cardinalities and intersections are hash-invariant (collision
    // probability ~n²/2^64, vanishing), and no output column exposes the
    // hash, so oracle parity is untouched. Strings only exist pre-hash.
    val sh = shingleSet(docs, idCol, textCol, n)
      .select(col("sid"), xxhash64(col("g")).as("g")).cache()
    val docsets = docsetsOf(sh).cache()
    // document frequency via a window over g (one shuffle, no agg+join),
    // then rarest-first position + set size in one shuffle over sid
    val bySid = Window.partitionBy(col("sid"))
    val prefix = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("sid"), col("g"),
        row_number().over(bySid.orderBy(col("df"), col("g"))).as("pos"),
        count(lit(1)).over(bySid).as("sz"))
      .filter(col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
    // Candidate pruning beyond the prefix filter, both exact (no false
    // negatives — every bound over-estimates the true intersection):
    //  - length filter: J ≥ τ forces τ·max(|A|,|B|) ≤ min(|A|,|B|)
    //  - positional filter (ppjoin): a common token at rarest-first
    //    positions (pa, pb) bounds the intersection by
    //    min(pa,pb) + min(|A|-pa, |B|-pb); J ≥ τ needs
    //    inter·(1+τ) ≥ τ·(|A|+|B|), so rows whose bound can't reach it
    //    are dropped before the pair ever reaches verification.
    val pa = col("a.pos"); val pb = col("b.pos")
    val sa = col("a.sz"); val sb = col("b.sz")
    val ubound = least(pa, pb) + least(sa - pa, sb - pb)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.sid") < col("b.sid")
          && sa * threshold <= sb && sb * threshold <= sa
          && ubound * (1 + threshold) >= (sa + sb) * threshold)
      .select(col("a.sid").as("da"), col("b.sid").as("db")).distinct()
    verifyJaccard(cand, docsets, threshold)
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
    val k = bands * rowsPerBand
    val sh = shingleSet(docs, idCol, textCol, n)
      .select(col("sid"), xxhash64(col("g")).as("g"), minhashBase(col("g")).as("x"))
      .cache()
    val mh = minhashSignatures(sh, k)
    val bucketCols = (0 until bands).map { b =>
      md5(concat_ws(",", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
    }
    val bandsDf = mh.select(col("sid"),
      posexplode(array(bucketCols: _*)).as(Seq("band", "bucket")))
    val cand = bandsDf.as("a").join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("da"), col("b.sid").as("db")).distinct()
    verifyJaccard(cand, docsetsOf(sh), threshold)
  }

  /** 16-bit SimHash signature per document over its distinct tokens. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("sid"), explode(tokenSet(col(textCol))).as("t"))
    val bitSums = toks.groupBy(col("sid"))
      .agg(sum(simhashContrib(col("t"), 0)).as("s0"),
        (1 until 16).map(i => sum(simhashContrib(col("t"), i)).as(s"s$i")): _*)
    val sig = (0 until 16)
      .map(i => when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col("sid"), sig.as("simhash"))
  }

}
