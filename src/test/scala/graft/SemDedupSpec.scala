package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, SemDedup}

/** SemDeDup (Abbas et al. 2023) invariants, pinned against a naive
  * in-memory reference on a corpus with planted semantic duplicates. */
class SemDedupSpec extends AnyFunSuite {

  private val Dim = 8

  /** Deterministic unit-ish vector from a seed. */
  private def vec(seed: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"sem_$seed".getBytes("UTF-8"))
    Array.tabulate(Dim)(j => ((md(j % md.length) & 0xff) - 128) / 128.0f)
  }

  /** Perturb v slightly → a semantic near-duplicate (cosine ≈ 1). */
  private def nudge(v: Array[Float], k: Int): Array[Float] =
    v.zipWithIndex.map { case (x, j) => x + (if (j == k % Dim) 0.01f else 0f) }

  private def corpus(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    val bases = (0 until 6).map(vec)
    // ids 0..5 are the seeds/bases; 10..27: three near-dups of each base;
    // 40..49: lone vectors
    val rows =
      bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
        (for (b <- 0 until 6; d <- 0 until 3)
          yield ((10 + b * 3 + d).toLong, nudge(bases(b), d).toSeq)) ++
        (40 until 50).map(i => (i.toLong, vec(100 + i).toSeq))
    rows.toDF("vec_id", "embedding")
  }

  private case class Out(id: Long, cluster: Long, centCos: Double, kept: Boolean)

  private def run(spark: org.apache.spark.sql.SparkSession, k: Int, tau: Double): Seq[Out] =
    SemDedup.dedup(corpus(spark), "vec_id", "embedding", k, tau)
      .orderBy("vec_id").collect()
      .map(r => Out(r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq

  test("kept set is pairwise-dissimilar below tau inside every cluster") {
    val spark = SparkTest.spark
    val tau = 0.9
    val out = run(spark, 6, tau)
    val vecs = corpus(spark).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for {
      (_, members) <- out.filter(_.kept).groupBy(_.cluster)
      a <- members; b <- members if a.id < b.id
    } assert(Ann.cosineD(vecs(a.id), vecs(b.id)) < tau,
      s"kept pair ${a.id},${b.id} above tau")
    // the planted near-dup families actually collapsed
    assert(out.count(!_.kept) >= 12, s"expected most planted dups dropped: $out")
  }

  test("every dropped doc has a better-ranked in-cluster neighbor within tau") {
    val spark = SparkTest.spark
    val tau = 0.9
    val out = run(spark, 6, tau)
    val vecs = corpus(spark).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val byCluster = out.groupBy(_.cluster)
    out.filter(!_.kept).foreach { d =>
      val better = byCluster(d.cluster).filter(o =>
        (o.centCos < d.centCos) || (o.centCos == d.centCos && o.id < d.id))
      assert(better.exists(o => Ann.cosineD(vecs(o.id), vecs(d.id)) >= tau),
        s"dropped ${d.id} with no qualifying neighbor")
    }
  }

  test("matches the naive reference exactly") {
    val spark = SparkTest.spark
    val tau = 0.9
    val out = run(spark, 6, tau)
    val vecs = corpus(spark).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // naive reference: same seed rule, same dominance rule
    val seeds = vecs.keys.toSeq.sorted.take(6).map(vecs)
    val assigned = vecs.map { case (id, v) =>
      val best = seeds.zipWithIndex
        .map { case (c, i) => (Ann.cosineD(v, c), i) }
        .reduceLeft((a, b) => if (b._1 > a._1) b else a) // strict >: ties keep lower index
      (id, best._2.toLong, best._1)
    }.toSeq
    val ref = assigned.map { case (id, cl, cc) =>
      val dominated = assigned.exists { case (jd, jcl, jcc) =>
        jcl == cl && ((jcc < cc) || (jcc == cc && jd < id)) &&
          Ann.cosineD(vecs(jd), vecs(id)) >= tau
      }
      Out(id, cl, cc, !dominated)
    }.sortBy(_.id)
    assert(out === ref)
  }

  test("null vectors are skipped, not NPE'd (user-facing TVF input)") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rows = Seq((0L, Option(vec(0).toSeq)), (1L, Option(vec(1).toSeq)),
      (2L, None: Option[Seq[Float]]))
    val out = SemDedup.dedup(rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 2, 0.9)
      .collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
  }

  test("dedupWithCentroids accepts caller-trained centroids") {
    val spark = SparkTest.spark
    val cents = Array(vec(0), vec(3)) // 2 coarse cells
    val out = SemDedup.dedupWithCentroids(corpus(spark), "vec_id", "embedding", cents, 0.9)
      .collect()
    assert(out.length === 34)
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(0L, 1L)))
  }
}
