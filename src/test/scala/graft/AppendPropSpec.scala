package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Dedup}

/** Property pins for the index-growth ticks on seeded random corpora
  * (the DedupPropSpec discipline):
  *   - BM25: build+append == build-over-union on postings rows + stats,
  *     for random splits of random corpora;
  *   - minhash admission: decisions equal a naive reference computed
  *     with brute-force shingle Jaccard + the LSH candidate rule, and
  *     the updated index is exactly ref ∪ admitted.
  */
class AppendPropSpec extends AnyFunSuite {

  private def docGen(vocab: Seq[String]): Gen[String] = for {
    len <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def corpus(nDocs: Int, seed: Long, idBase: Long): Seq[(Long, String)] = {
    val vocab = Seq("a", "b", "c", "d", "ee", "ff", "ggg", "hh")
    var s = org.scalacheck.rng.Seed(seed)
    (0 until nDocs).map { i =>
      val t = docGen(vocab).apply(Gen.Parameters.default, s).get; s = s.next
      (idBase + i, t)
    }
  }

  test("bm25 append == rebuild on random corpora and splits") {
    val spark = SparkTest.spark
    import spark.implicits._
    for (round <- 0 until 3) {
      val base = corpus(20 + round * 7, seed = 900 + round, idBase = 0L)
      // every round's batch carries zero-token (null-text) docs: they
      // rewrite no postings but must still land in the stats row —
      // the ADVICE-r12 corner where append used to undercount n
      val batch = corpus(5 + round * 3, seed = 950 + round, idBase = 1000L) ++
        (0 until (1 + round)).map(i => (2000L + i, null: String))
      // the generator also re-submits rows WITHIN the batch: the
      // uniform intra-batch rule ingests each id once, so append ==
      // rebuild over base ∪ DISTINCT(batch) (ManifestIO.dedupBatch)
      val withDups = batch ++ batch.take(2 + round)

      val dirA = Files.createTempDirectory(s"bm25prA$round").toString
      Bm25.buildIndex(base.toDF("doc_id", "text"), "doc_id", "text", dirA)
      Bm25.appendToIndex(spark, dirA, withDups.toDF("doc_id", "text"), "doc_id", "text")
      val dirB = Files.createTempDirectory(s"bm25prB$round").toString
      Bm25.buildIndex((base ++ batch).toDF("doc_id", "text"), "doc_id", "text", dirB)

      def postings(dir: String) = Bm25.readPostings(spark, dir)
        .select("t", "doc_id", "tf", "dl", "bucket")
        .collect().map(_.toSeq).toSet
      assert(postings(dirA) == postings(dirB), s"round $round")
      // df is a read-time aggregate now: recompute and compare per term
      def dfOf(dir: String) = {
        import org.apache.spark.sql.functions._
        Bm25.readPostings(spark, dir)
          .groupBy(col("t")).agg(count(lit(1)).as("df"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(dfOf(dirA) == dfOf(dirB), s"round $round")
      def stats(dir: String) = Bm25.readStats(spark, dir)
        .select("n", "sdl").head().toSeq
      assert(stats(dirA) == stats(dirB), s"round $round")
      // the ACCRETIVE reverse map (round 17) must equal the rebuild's
      // too — including the zero-token docs' (dl = 0, empty tbuckets)
      // rows, which only the docmap records
      def docmap(dir: String) = {
        import org.apache.spark.sql.functions._
        Bm25.readDocmapAt(spark, dir, Bm25.readManifest(spark, dir))
          .select(col("doc_id"), col("dl"),
            array_sort(col("tbuckets")).as("tb"), col("dbucket"))
          .collect().map(_.toSeq).toSet
      }
      assert(docmap(dirA) == docmap(dirB), s"round $round")
      // the EXPORT clone (round 17) replays the accreted index exactly:
      // postings, read-time df, stats and reverse map all equal
      val dirC = Files.createTempDirectory(s"bm25prC$round").toString + "/c"
      Bm25.exportIndex(spark, dirA, dirC)
      assert(postings(dirC) == postings(dirA) && dfOf(dirC) == dfOf(dirA) &&
        stats(dirC) == stats(dirA) && docmap(dirC) == docmap(dirA),
        s"round $round: export must clone the index bit-identically")
    }
  }

  test("ivf committed build+append == build-over-union on random corpora and splits") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dim = 8
    def vecs(n: Int, seed: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        (idBase + i, Seq.tabulate(dim)(j =>
          (((seed * 131 + i * 31 + j * 17) % 23) - 11).toFloat / 5f))
      }
    for (round <- 0 until 3) {
      val base = vecs(30 + round * 10, seed = 40 + round, idBase = 0L)
      val batch = vecs(10 + round * 5, seed = 80 + round, idBase = 1000L)
      val cents = Array.tabulate(3 + round)(c =>
        Array.tabulate(dim)(j => (((c * 37 + j * 13) % 19) - 9).toFloat / 4f))

      val dirA = java.nio.file.Files.createTempDirectory(s"ivfprA$round").toString
      graft.operators.Ann.ivfIndexBuild(base.toDF("cid", "cvec"), dirA, cents)
      graft.operators.Ann.ivfIndexAppend(spark, dirA, batch.toDF("cid", "cvec"))
      val dirB = java.nio.file.Files.createTempDirectory(s"ivfprB$round").toString
      graft.operators.Ann.ivfIndexBuild((base ++ batch).toDF("cid", "cvec"), dirB, cents)

      def cells(dir: String) = graft.operators.Ann.readIvfCells(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(cells(dirA) == cells(dirB) &&
        cells(dirA).size == base.size + batch.size, s"round $round")
      // the ACCRETIVE reverse map (round 17) must equal the rebuild's
      def cidmap(dir: String) = graft.operators.Ann.readIvfCidmap(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(cidmap(dirA) == cidmap(dirB), s"round $round")
      // and the drift-stats sidecar reproduces the rebuild's per-cell
      // sums once re-aggregated (versions differ; the totals may not)
      def drift(dir: String) = {
        import org.apache.spark.sql.functions._
        graft.operators.Ann.ivfGeometryDrift(spark, dir)
          .agg(sum(col("n_vectors")), sum(col("sum_cos_fp")))
          .head().toSeq
      }
      assert(drift(dirA) == drift(dirB), s"round $round")
      val q = vecs(4, seed = 200 + round, idBase = 5000L).toDF("qid", "qvec")
      def serve(dir: String) = graft.operators.Ann
        .ivfServedTopK(spark, dir, q, k = 5, nprobe = 2)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
      assert(serve(dirA) == serve(dirB) && serve(dirA).nonEmpty, s"round $round")
      // the EXPORT clone (round 17) serves and drifts identically
      val dirC = java.nio.file.Files
        .createTempDirectory(s"ivfprC$round").toString + "/c"
      graft.operators.Ann.ivfIndexExport(spark, dirA, dirC)
      assert(serve(dirC) == serve(dirA) && cidmap(dirC) == cidmap(dirA) &&
        drift(dirC) == drift(dirA),
        s"round $round: export must clone the index bit-identically")
    }
  }

  test("minhash admission decisions equal the kernel gate; updated index = ref ∪ admitted") {
    val spark = SparkTest.spark
    import spark.implicits._
    val N = 3; val Bands = 4; val Rpb = 4; val Tau = 0.5
    for (round <- 0 until 3) {
      // duplicate-heavy corpora so the gate actually fires
      val ref0 = corpus(15, seed = 700 + round, idBase = 0L)
      val batch0 = corpus(10, seed = 730 + round, idBase = 100L)
      val batch = batch0 ++ ref0.take(3).map { case (id, t) => (id + 200L, t) }

      val refIndex = Dedup.minhashDocIndex(ref0.toDF("doc_id", "text"),
        "doc_id", "text", N, Bands, Rpb)
      val adm = Dedup.minhashIndexAdmit(refIndex, batch.toDF("doc_id", "text"),
        "doc_id", "text", N, Bands, Rpb, Tau)

      // reference: the shipped cross-corpus kernel (itself pinned vs
      // brute force in DedupPropSpec) decides who is flagged
      val flagged = Dedup.minhashLshPairsAcross(
          batch.toDF("doc_id", "text"), ref0.toDF("doc_id", "text"),
          "doc_id", "text", N, Bands, Rpb, Tau)
        .select("da").collect().map(_.getLong(0)).toSet
      // docs with < N tokens have no shingle set → no index row and no
      // verdict (the family's documented totality convention)
      def shingled(docs: Seq[(Long, String)]): Set[Long] =
        Dedup.docsetRows(docs.toDF("doc_id", "text"), "doc_id", "text", N)
          .collect().map(_._1).toSet
      val decisions = adm.decisions.collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(decisions.keySet == shingled(batch), s"round $round")
      for ((sid, admitted) <- decisions)
        assert(admitted == !flagged.contains(sid), s"round $round sid $sid")

      val idx = adm.updatedIndex.select("sid").collect().map(_.getLong(0)).toSet
      val want = shingled(ref0) ++ (shingled(batch) -- flagged)
      assert(idx == want, s"round $round")
    }
  }
}
