package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — the link-graph quality weight a crawl
  * curation pipeline assigns to pages/domains before sampling (the
  * Common-Crawl-style "seed quality" signal; same family as the
  * harmonic-centrality ranking published with CC's domain graphs).
  *
  * All arithmetic is INTEGER (ranks scaled by `Scale`, floor division
  * at both the per-edge contribution and the damping step), so the
  * result is independent of partitioning and accumulation order and a
  * SQL oracle reproduces it bit-for-bit — the same determinism rule as
  * the bigram-LM scores (`BigramLm.Scale`).
  *
  * Scale shape: each iteration is one equi-join of the edge list with
  * the current ranks (shuffle on `src`) plus one partial-aggregated
  * `groupBy(dst).sum` — the Pregel-lite message-passing round
  * expressed relationally. The edge frame is reused every round;
  * callers looping many iterations should persist it. No driver-side
  * state: iteration count is a fixed small constant, the loop is plan
  * composition only.
  */
object PageRank {

  val Scale = 1000000L

  /** `iters` rounds of r'(v) = base + 85·(Σ_{u→v} ⌊r(u)/outdeg(u)⌋)/100
    * (floor at each division) over a directed edge list. Self-loops and
    * duplicate edges are dropped. Returns (node, pagerank), one row per
    * node in `nodes` (sinks and sources included; nodes absent from the
    * edge list keep rank = base each round). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int,
      base: Long = 150000L): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters must be in [0, 50], got $iters")
    val n = nodes.select(col(nodeCol).cast("long").as("v")).distinct()
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val ed = e.join(outdeg, "src") // (src, dst, d) — reused each round
    var ranks = n.withColumn("r", lit(Scale))
    var i = 0
    while (i < iters) {
      val contribs = ed
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("r div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      ranks = n.join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(base) + expr(s"85 * coalesce(s, 0L) div 100")).as("r"))
      i += 1
    }
    ranks.select(col("v").as("node"), col("r").as("pagerank"))
  }
}
