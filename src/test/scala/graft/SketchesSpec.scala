package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** CMS + HLL sketches beyond the t43/t44 oracles: the CMS never-
  * underestimates guarantee and exactness-at-min over random corpora,
  * sketch-state mergeability (the property that makes both shapes
  * survive a distributed tree aggregation), and HLL accuracy within
  * the standard-error envelope on a large synthetic vocabulary.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def corpus(seed: Int, nDocs: Int, vocab: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until nDocs.toLong).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(12))("w" + rnd.nextInt(vocab)).mkString(" ")
    }
  }

  test("CMS never underestimates and matches true counts exactly when min avoids collisions") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val docs = corpus(seed, 50, 40).toDF("doc_id", "text")
      val rows = Sketches.cmsEstimates(docs, "text", depth = 4, width = 16).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(3) >= 0L, s"CMS underestimated ${r.getString(0)}")
        assert(r.getLong(2) >= r.getLong(1))
      }
      // 40 terms in 16 cells across 4 independent rows: at least one
      // term should be collision-free in some row (estimate == truth)
      assert(rows.exists(_.getLong(3) == 0L))
    }
  }

  test("CMS grids merge by addition: sketch(A ++ B) == sketch(A) + sketch(B)") {
    import spark.implicits._
    val a = corpus(5, 30, 30)
    val b = corpus(6, 30, 30)
    def grid(c: Seq[(Long, String)]): Map[(Int, Long), Long] =
      Sketches.cmsEstimates(c.toDF("doc_id", "text"), "text", 4, 16)
        .select(col("term"), col("true_count")).collect()
        .flatMap { r =>
          (0 until 4).map { row =>
            val cell = Seq((r.getString(0), row)).toDF("t", "r")
              .select(Sketches.cmsCell(col("t"), row, 16)).collect().head.getLong(0)
            (row, cell) -> r.getLong(1)
          }
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val ga = grid(a); val gb = grid(b); val gab = grid(a ++ b.map { case (i, t) => (i + 1000L, t) })
    gab.foreach { case (cell, cnt) =>
      assert(cnt === ga.getOrElse(cell, 0L) + gb.getOrElse(cell, 0L),
        s"grid cell $cell not additive")
    }
  }

  test("HLL estimate lands within the standard-error envelope on a 1000-term vocabulary") {
    import spark.implicits._
    val docs = (0L until 250L).map { id =>
      id -> (0 until 4).map(j => "tok" + (id * 4 + j)).mkString(" ")
    }.toDF("doc_id", "text")   // exactly 1000 distinct tokens
    val r = Sketches.hllRegisters(docs, "text").collect()
    assert(r.length === 16)
    val est = r.head.getDouble(2)
    val truth = r.head.getLong(3)
    assert(truth === 1000L)
    // raw HLL with m=16: σ ≈ 1.04/√16 = 26%; allow 2σ
    assert(math.abs(est - truth) / truth <= 0.52, s"HLL estimate $est vs $truth")
    // registers merge by max: the sketch state of the union is the
    // element-wise max of the halves
    val h1 = Sketches.hllRegisters(docs.filter(col("doc_id") < 125), "text")
      .select("bucket", "register").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val h2 = Sketches.hllRegisters(docs.filter(col("doc_id") >= 125), "text")
      .select("bucket", "register").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val hu = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    hu.foreach { case (b, m) =>
      assert(m === math.max(h1.getOrElse(b, 0L), h2.getOrElse(b, 0L)),
        s"register $b not max-mergeable")
    }
  }

  test("per-group HLL: each group's registers equal the global sketch of that group alone") {
    import spark.implicits._
    val docs = (0L until 300L).map { id =>
      val grp = "src" + (id % 3)
      (id, grp, (0 until 4).map(j => s"$grp-tok${id * 4 + j}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val grouped = Sketches.hllRegistersByGroup(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    for (g <- Seq("src0", "src1", "src2")) {
      val alone = Sketches.hllRegisterRows(docs.filter(col("source") === g), "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val mine = grouped.collect { case ((`g`, b), (reg, _, _)) => b -> reg }
      assert(mine == alone, s"group $g registers diverge from its solo sketch")
      // truth column is exact; the estimate must agree with the GLOBAL
      // sketch computed on the group alone (self-consistency — raw HLL
      // accuracy at m=16 is a statement about random hashes, not any
      // one fixed realization, so it is not asserted per group; the
      // t44 envelope test covers accuracy on a large vocabulary)
      val (_, est, truth) = grouped.collect { case ((`g`, _), v) => v }.head
      assert(truth == 400L)
      val soloEst = Sketches.hllRegisters(docs.filter(col("source") === g), "text")
        .collect().head.getDouble(2)
      assert(math.abs(est - soloEst) / soloEst < 1e-9,
        s"group $g estimate $est diverges from solo sketch $soloEst")
    }
  }
}
