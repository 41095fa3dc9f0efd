package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Numeric portability: every reduction over vector elements is a
  * *sequential left fold* (`aggregate` in Spark == `list_reduce` in the
  * oracle SQL), with elements cast to double before multiplication, so
  * both engines produce bit-identical IEEE doubles and rank ties cannot
  * diverge.
  *
  * Scale design:
  *   - Brute force is the correctness baseline: broadcast the (small)
  *     query set, one pass over the corpus, per-query top-k via window —
  *     O(Q·N·d) but embarrassingly parallel, no shuffle of the corpus.
  *   - The LSH path buckets corpus + queries by signs of K fixed ±1
  *     hyperplanes (deterministic, seed-derived), joins on the bucket id,
  *     and only scores within buckets — the 100 TB path where Q·N is
  *     unpayable. Bucket skew is bounded because sign-patterns of random
  *     hyperplanes split mass ~evenly.
  */
object Ann {

  /** Sequential-fold dot product of two float-vector columns (double).
    * Backed by the codegen'd [[graft.functions.FloatVecDot]] — same
    * accumulation order and promotion as `aggregate(zip_with(...))`, ~10×
    * less per-row overhead. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.fvec_dot(a, b)

  /** Sequential-fold squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity in doubles; sqrt is correctly-rounded IEEE so the
    * result is engine-independent given identical folds. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Deterministic ±1 hyperplane: component j of plane p is +1 iff the
    * first hex nibble of md5("p_j") is < '8'. Same constants are inlined
    * into the oracle SQL. (±1 is exact in float; promotion to double in
    * the dot product keeps engine parity.) */
  def hyperplane(p: Int, dim: Int): Seq[Float] =
    (0 until dim).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${p}_$j".getBytes("UTF-8"))
      if (((md(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
    }

  /** LSH bucket id: K sign bits of ±1-hyperplane projections. */
  def lshBucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(dot(vec, typedLit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k neighbors by cosine for each query vector (brute force).
    * `queries` is broadcast; ranks are (cosine desc, neighbor id asc). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.qid") =!= col("c.cid"))
      .select(col("q.qid"), col("c.cid"),
        cosine(col("q.qvec"), col("c.cvec")).as("cosine"))
    topK(scored, k)
  }

  /** ANN via single-probe hyperplane-LSH bucket join, then exact cosine
    * rank within the bucket. May return < k neighbors per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, planes: Seq[Seq[Float]], k: Int): DataFrame = {
    val cb = corpus.select(col("cid"), col("cvec"), lshBucket(col("cvec"), planes).as("bucket"))
    val qb = queries.select(col("qid"), col("qvec"), lshBucket(col("qvec"), planes).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qvec"), col("cvec")).as("cosine"))
    topK(scored, k)
  }

  /** Embedding near-duplicate pairs via hyperplane-LSH bucketing: only
    * same-bucket pairs are scored, so the plan is an equi-join on the
    * bucket id (shuffle/broadcast hash join) — never the O(N²)
    * BroadcastNestedLoopJoin of the exact formulation. Single-probe:
    * a near-pair split across buckets is missed (recall < 1), which is
    * the documented LSH trade; the exact small-N oracle stays available
    * as the brute-force query. */
  def lshNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Float]], threshold: Double): DataFrame = {
    val b = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"), col("cosine"))
  }
}
