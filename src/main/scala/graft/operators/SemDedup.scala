package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup
  * pipeline stage (Abbas et al. 2023, arXiv:2303.09540): cluster the
  * corpus in embedding space, then inside each cluster drop documents
  * whose pairwise cosine exceeds a threshold, keeping one representative
  * per near-duplicate neighborhood.
  *
  * Differences from the textual near-dup family ([[Dedup]]): similarity
  * is semantic (embedding cosine), so paraphrases and translations that
  * share no n-grams still collapse; the cluster step bounds the pairwise
  * work exactly like LSH banding bounds it for minhash.
  *
  * Keep rule (deterministic, order-independent): within a cluster, rank
  * documents by cosine-to-centroid ASCENDING (the paper keeps the
  * examples least typical of the cluster), ties by id; a document is
  * DROPPED iff some better-ranked document in its cluster is within
  * `tau` cosine. Consequently the kept set is pairwise-dissimilar
  * (< tau) inside every cluster — a stricter, rank-stable variant of
  * the paper's sequential greedy (which only tests against previously
  * KEPT docs; on chains a-b-c the greedy may keep c where this rule
  * drops it).
  *
  * Scale design (100 TB): centroids are a driver-side array (the paper
  * uses ~100k — a few hundred MB broadcast at most); assignment is one
  * narrow codegen'd scan, no shuffle. The only wide ops are one
  * hash-partition by cluster id (window + self-join reuse the same
  * partitioning) and the final id join. Pairwise work is Σ n_c² over
  * clusters — bounded by making `numClusters` proportional to corpus
  * size, the same knob as the paper. Vector folds are sequential
  * doubles ([[Ann.cosine]]) so the oracle replays them bit-identically.
  */
object SemDedup {

  /** Assignment column: negated index + cosine of the best centroid.
    * One flat `greatest` over (cosine, -index) structs — max cosine,
    * ties to the LOWEST index (struct ordering picks the highest
    * -index). A chained when-reduce would embed each step's tree twice
    * and blow up 2^K; greatest keeps the expression linear in K. */
  private def bestCentroid(vec: Column, vecL2: Column,
      cents: Array[Array[Float]]): Column = {
    // vector norm once per ROW (vecL2), centroid norms once per PLAN
    // (Scala-side sqrt(dotD) == the codegen'd sqrt(fvec_dot) bit-for-
    // bit) — not 3 dots per (row, centroid); see [[Ann.cosinePre]]
    val cands = cents.zipWithIndex.map { case (c, i) =>
      struct(Ann.cosinePre(Ann.dot(vec, typedLit(c.toSeq)),
        vecL2, lit(math.sqrt(Ann.dotD(c, c)))).as("c"), lit(-i).as("nid"))
    }
    if (cands.length == 1) cands.head else greatest(cands.toIndexedSeq: _*)
  }

  /** Core pass with caller-supplied centroids (plug in
    * [[Ann]] k-means-trained centroids in production; the v14 query uses
    * deterministic lowest-id seeds so DuckDB can replay the whole pass).
    *
    * Returns one row per input: (vec_id, cluster_id, cent_cos, kept). */
  def dedupWithCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], tau: Double): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    val assigned = vecs
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      // user-facing TVF over arbitrary parquet: null ids/vectors carry
      // nothing to assign (the Phrases.tag convention)
      .filter(col("vec_id").isNotNull && col("v").isNotNull)
      .withColumn("_vl", Ann.l2norm(col("v")))
      .withColumn("best", bestCentroid(col("v"), col("_vl"), cents))
      .select(col("vec_id"), col("v"), col("_vl"),
        (-col("best").getField("nid")).cast("long").as("cluster_id"),
        col("best").getField("c").as("cent_cos"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("cent_cos").asc, col("vec_id").asc)
    val ranked = assigned.withColumn("rk", row_number().over(w))
    // dominated = has a better-ranked neighbor within tau in its cluster.
    // Equi-key is the cluster id, so the join reuses the window's
    // partitioning; per-cluster pair count is the Σ n_c² budget — paid
    // at 1 dot per pair (norms ride the rows; see [[Ann.cosinePre]]).
    val dominated = ranked.as("i")
      .join(ranked.as("j"),
        col("i.cluster_id") === col("j.cluster_id")
          && col("j.rk") < col("i.rk")
          && Ann.cosinePre(Ann.dot(col("i.v"), col("j.v")),
            col("i._vl"), col("j._vl")) >= tau,
        "left_semi")
      .select(col("vec_id"), lit(true).as("dominated"))
    ranked
      .join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"), col("cent_cos"),
        col("dominated").isNull.as("kept"))
  }

  /** Deterministic seed centroids: the `numClusters` lowest-id vectors
    * (bounded driver collect — the seed array is the broadcast model). */
  private def seedCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      numClusters: Int): Array[Array[Float]] = {
    require(numClusters > 0 && numClusters <= 4096,
      s"numClusters must be in (0, 4096], got $numClusters (driver holds the seed array)")
    vecs
      .select(col(idCol).cast("long"), col(vecCol))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .limit(numClusters)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
  }

  /** SemDeDup with deterministic seed centroids: the `numClusters`
    * lowest-id vectors. Fully oracle-replayable (no iterative float
    * training); recall that seed CHOICE only moves the cluster
    * boundaries — the drop rule inside each cluster is the paper's. */
  def dedup(vecs: DataFrame, idCol: String, vecCol: String,
      numClusters: Int, tau: Double): DataFrame =
    dedupWithCentroids(vecs, idCol, vecCol,
      seedCentroids(vecs, idCol, vecCol, numClusters), tau)

  /** Cluster-balanced subset selection: cap every embedding cluster's
    * contribution at `quota` examples — the diversity-preserving
    * downsampling step (the counterpart of source-mix capping, but in
    * SEMANTIC space: a crawl where one template dominates loses at most
    * `quota` slots to it, however many copies exist). Selection inside
    * a cluster follows the engine's deterministic sampling discipline
    * (the t12/t38 salted-md5 order — uniform, reproducible,
    * partition-independent), so the whole pass is oracle-replayable.
    *
    * Scale shape: assignment is the same narrow broadcast-centroid scan
    * as [[dedupWithCentroids]]; the only exchange is ONE hash partition
    * by cluster id for the quota window — no pairwise work at all, so
    * (unlike SemDeDup's Σ n_c² verify) a mega-cluster costs its row
    * count, not its square.
    *
    * Returns one row per input: (vec_id, cluster_id, cluster_rank,
    * selected). */
  def clusterSampleWithCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val assigned = assignClusters(vecs, idCol, vecCol, cents)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(md5(concat(lit("cs:"), col("vec_id").cast("string"))), col("vec_id"))
    assigned
      .withColumn("cluster_rank", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("cluster_id"), col("cluster_rank"),
        (col("cluster_rank") <= quota).as("selected"))
  }

  /** Narrow nearest-centroid assignment (broadcast centroid array, one
    * codegen'd scan, no shuffle): (vec_id, cluster_id) rows. Null
    * ids/vectors carry nothing to assign (the TVF convention). */
  def assignClusters(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]]): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    vecs
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .filter(col("vec_id").isNotNull && col("v").isNotNull)
      .withColumn("best", bestCentroid(col("v"), Ann.l2norm(col("v")), cents))
      .select(col("vec_id"),
        (-col("best").getField("nid")).cast("long").as("cluster_id"))
  }

  /** [[clusterSampleWithCentroids]] over deterministic lowest-id seed
    * centroids (plug in k-means centroids in production). */
  def clusterSample(vecs: DataFrame, idCol: String, vecCol: String,
      numClusters: Int, quota: Int): DataFrame =
    clusterSampleWithCentroids(vecs, idCol, vecCol,
      seedCentroids(vecs, idCol, vecCol, numClusters), quota)
}
