package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the
  * cluster-resolution step a dedup pipeline runs after pair generation:
  * near-dup pairs are edges, a component is a duplicate cluster, and
  * the canonical survivor is the component minimum.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14). Converges
  * in O(log² n) rounds on any graph — unlike naive min-label
  * propagation, whose round count is the graph DIAMETER (a chain of
  * near-dup shards from a sorted corpus can make that linear). Each
  * round is a constant number of hash-shuffles keyed on node id; state
  * is the edge list itself, never materialized adjacency lists, so a
  * high-degree hub costs a big shuffle group but no single-task array.
  * Lineage is truncated every round with `localCheckpoint` — on a real
  * cluster swap for `checkpoint` against a reliable store so a lost
  * executor doesn't recompute the whole iteration history.
  */
object Components {

  /** (node, component) for every node appearing in `edges`, where
    * component = the minimum node id reachable. Self-loops are ignored.
    * Isolated nodes never appear in an edge list — union them in from
    * the entity table (as their own component) if the caller needs
    * total coverage. Throws if `maxIter` rounds pass without
    * convergence (log² n rounds suffice; 50 covers any realistic n). */
  def connectedComponents(edges0: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    // canonical directed-to-smaller form: (hi, lo), hi > lo, distinct
    var e = edges0
      .select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("hi"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()

    def signature(df: DataFrame): (Long, String) = {
      // decimal sum: xxhash64 terms are ±2^63 and an ANSI long sum overflows
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1).toPlainString)
    }

    var sig = signature(e)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // large-star: center every node u over BOTH edge orientations and
      // connect each strictly-larger neighbor v to m = min(Γ(u) ∪ {u}).
      // m <= u < v, so the output stays in (hi, lo) form.
      val both = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = both.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = both.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star: in the directed-to-smaller graph, each center hi
      // re-attaches its smaller neighborhood (and itself) to the min.
      val mins2 = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val small = large.join(mins2, "hi")
        .where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionAll(mins2.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint()
      val nextSig = signature(small)
      converged = nextSig == sig
      sig = nextSig
      e = small
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // converged state is a set of stars: every non-root points at its
    // component min, roots appear only on the lo side
    e.select(col("hi").as("node"), col("lo").as("component"))
      .unionAll(e.select(col("lo").as("node"), col("lo").as("component")).distinct())
      .distinct()
  }

  /** A signature graph whose edge list fits under this bound is folded
    * on the driver (≈16 bytes/edge → ~80 MB at the bound); beyond it
    * the distributed star algorithm runs. A 16-bit signature space is
    * bounded by ~23M edges (every signature within distance 3 of every
    * chunk-mate — the adversarial dense case), so a sufficiently dense
    * corpus CAN exceed the bound and takes the fallback; typical
    * corpora sit orders of magnitude below it. Public so the
    * cluster-resolution entry points (media m14, embedding v20, the
    * pair-derived split t52) can thread a caller-chosen bound down to
    * [[componentsAuto]]. */
  val MaxDriverEdges = 5000000

  /** (node, component) of an edge frame via the bounded driver
    * union-find fast path, degrading to the distributed star rounds
    * past `maxDriverEdges` — the dupClusters path-selection discipline
    * as a reusable step for the other cluster-resolution operators
    * (media m14, embedding v20). The count-limited probe decides the
    * path without shipping over-bound edges to the driver. */
  def componentsAuto(edges0: DataFrame, srcCol: String, dstCol: String,
      maxDriverEdges: Int = MaxDriverEdges): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val e = edges0
      .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .as[(Long, Long)].persist()
    val overBound = e.limit(maxDriverEdges + 1).count() > maxDriverEdges
    val out =
      if (!overBound) {
        val res = unionFindComponents(e.collect()).toDF("node", "component")
        e.unpersist()
        res
      } else {
        // connectedComponents localCheckpoints its canonical edge frame
        // up front, so the input persist can be released afterwards
        val res = connectedComponents(e.toDF("s", "o"), "s", "o")
        e.unpersist()
        res
      }
    out
  }

  /** Min-labelled components of a COLLECTED edge list: union-find with
    * path halving, then each node labelled with its component's minimum
    * — the same fixpoint the star algorithm converges to. */
  private[graft] def unionFindComponents(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb) }
    }
    val minOf = new scala.collection.mutable.LongMap[Long]()
    parent.keys.foreach { n =>
      val r = find(n)
      minOf.update(r, math.min(minOf.getOrElse(r, Long.MaxValue), n))
    }
    parent.keys.map(n => (n, minOf(find(n)))).toSeq
  }

  /** Duplicate-cluster resolution over a documents table: simhash
    * near-pairs (Hamming ≤ maxDist) are the edges, components over the
    * SIGNATURE graph (≤ 2¹⁶ nodes regardless of corpus size) are the
    * clusters, and each cluster's minimum doc id is its keeper. Docs
    * pick up their cluster by a broadcast probe; the keeper map (one
    * row per cluster) broadcasts back — the only doc-sized shuffles are
    * the signature pass and whatever the caller sorts by.
    *
    * Because the signature space bounds the graph independent of corpus
    * size, the component fold normally runs as a driver union-find over
    * the collected edge list — the same bounded-metadata driver fold as
    * [[Prefix]]'s per-partition offsets, replacing ~5 shuffle rounds of
    * the star loop with one collect. A wider signature family that
    * blows past [[MaxDriverEdges]] falls back to the distributed
    * [[connectedComponents]]. Returns (doc_id, cluster,
    * keeper_doc_id). */
  def dupClusters(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame =
    dupClustersBounded(docs, idCol, textCol, maxDist, MaxDriverEdges)

  /** [[dupClusters]] with an injectable driver-edge bound — specs force
    * the distributed [[connectedComponents]] fallback on small corpora
    * through it and hash-match it against the driver union-find path. */
  private[graft] def dupClustersBounded(docs: DataFrame, idCol: String,
      textCol: String, maxDist: Int, maxDriverEdges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = Dedup.simhashSignatures(docs, idCol, textCol)
    val edges = Dedup.simhashSigPairs(sigs.select(col("simhash")).distinct(), maxDist)
      .where(col("s") < col("o"))
      .select(col("s"), col("o")).as[(Long, Long)]
      .persist()
    // count-limited probe: decides the path without shipping 80 MB of
    // over-bound edges to the driver just to discard them; the persist
    // keeps the pair kernel from running twice on either path
    val overBound = edges.limit(maxDriverEdges + 1).count() > maxDriverEdges
    val comp =
      if (!overBound)
        unionFindComponents(edges.collect()).toDF("simhash", "component")
      else
        connectedComponents(edges.toDF("s", "o"), "s", "o")
          .withColumnRenamed("node", "simhash")
    edges.unpersist()
    val withCluster = sigs.join(broadcast(comp), Seq("simhash"), "left")
      .select(col("sid").as("doc_id"),
        coalesce(col("component"), col("simhash")).as("cluster"))
    val keepers = withCluster.groupBy(col("cluster"))
      .agg(min(col("doc_id")).as("keeper_doc_id"))
    withCluster.join(broadcast(keepers), "cluster")
      .select(col("doc_id"), col("cluster"), col("keeper_doc_id"))
  }
}
