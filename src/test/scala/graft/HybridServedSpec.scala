package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Bm25, Hybrid}
import graft.streaming.HybridStream

/** Committed-index hybrid retrieval ([[Hybrid.servedTopK]]) and its
  * streaming serve ([[HybridStream.serveStream]]): with nprobe covering
  * every cell the served composition equals the correctness-baseline
  * [[Hybrid.hybridTopK]] row-for-row; at production nprobe the vector
  * leg reads ONLY probed cells' committed files and the lexical leg
  * only the query terms' buckets; a streamed query batch serves epoch
  * by epoch to the same rows as the one-shot batch, re-pinning the
  * index manifests per micro-batch so appends land between epochs.
  */
class HybridServedSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Int) = Seq.tabulate(dim)(j =>
    (((seed * 31 + j * 17) % 13) - 6).toFloat / 3f)
  private val words = Vector("apple", "banana", "cherry", "date", "fig",
    "grape", "kiwi", "lemon")
  private def text(i: Int) =
    s"${words(i % 8)} ${words((i / 2) % 8)} ${words((i * 3 + 1) % 8)} ${words((i * 5 + 2) % 8)}"

  private val corpus = (100 until 140).map(i => (i.toLong, text(i), vec(i)))
  private val cents = Array.tabulate(4)(c => vec(c * 7 + 1).toArray)
  private val kLeg = 5
  private val k = 5

  // (qid, term, qvec) rows — two terms per query, vector repeated
  private def queryRows(qids: Seq[Long]): Seq[(Long, String, Seq[Float])] =
    qids.flatMap(q => Seq(
      (q, words((q % 8).toInt), vec(q.toInt + 500)),
      (q, words(((q + 3) % 8).toInt), vec(q.toInt + 500))))

  private def buildIndexes(): (String, String) = {
    val bm25Dir = Files.createTempDirectory("hsrvbm25").toString
    val ivfDir = Files.createTempDirectory("hsrvivf").toString
    Bm25.buildIndex(corpus.map(c => (c._1, c._2)).toDF("doc_id", "text"),
      "doc_id", "text", bm25Dir)
    Ann.ivfIndexBuild(corpus.map(c => (c._1, c._3)).toDF("cid", "cvec"),
      ivfDir, cents)
    (bm25Dir, ivfDir)
  }

  test("nprobe == cells: served hybrid equals the correctness-baseline hybridTopK") {
    val (bm25Dir, ivfDir) = buildIndexes()
    val q = queryRows(Seq(1L, 2L, 3L)).toDF("qid", "term", "qvec")
    val served = Hybrid.servedTopK(spark, bm25Dir, ivfDir, q, kLeg, k,
        nprobe = cents.length)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val baseline = Hybrid.hybridTopK(corpus.toDF("doc_id", "text", "vec"),
        "doc_id", "text", "vec", q, kLeg, k)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(served == baseline && served.nonEmpty)
  }

  test("production nprobe: the legs read only probed cells and queried buckets") {
    val (bm25Dir, ivfDir) = buildIndexes()
    val q = queryRows(Seq(1L, 2L, 3L)).toDF("qid", "term", "qvec")
    val fused = Hybrid.servedTopK(spark, bm25Dir, ivfDir, q, kLeg, k, nprobe = 2)
    val files = fused.inputFiles

    // vector leg: cells read ⊆ the queries' nprobe-nearest committed cells
    val served = Ann.readIvfCentroids(spark, ivfDir)
    val allowedCells = queryRows(Seq(1L, 2L, 3L)).map(_._3.toArray)
      .flatMap(v => Ann.nearestCells(served, v, 2)).toSet
    val readCells = files.filter(_.contains("/cells/"))
      .map(f => f.split("cell=").last.split("/").head.toInt).toSet
    assert(readCells.nonEmpty && readCells.subsetOf(allowedCells),
      s"vector leg read cells $readCells beyond probed $allowedCells")

    // lexical leg: buckets read ⊆ the query terms' buckets
    val m = Bm25.readManifest(spark, bm25Dir)
    val allowedBuckets = queryRows(Seq(1L, 2L, 3L)).map(_._2).distinct
      .toDF("t")
      .select(pmod(xxhash64(col("t")), lit(m.buckets)).cast("int"))
      .collect().map(_.getInt(0)).toSet
    val readBuckets = files.filter(_.contains("/postings/"))
      .map(f => f.split("bucket=").last.split("/").head.toInt).toSet
    assert(readBuckets.nonEmpty && readBuckets.subsetOf(allowedBuckets),
      s"lexical leg read buckets $readBuckets beyond queried $allowedBuckets")
  }

  test("legs are null-independent: an all-null-term qid still serves on its vector leg") {
    // the r14 advice finding: servedTopK's row-level AND dropped a qid
    // whose term rows are all null (e.g. terms drawn by element_at
    // past a short doc's token count) from the VECTOR leg too; the
    // legs filter per-modality now, matching the batch oracle's shape
    // (its vector CTE never looked at terms)
    val (bm25Dir, ivfDir) = buildIndexes()
    val rows: Seq[(java.lang.Long, String, Seq[Float])] = Seq(
      (1L, words(1), vec(501)), (1L, words(4), vec(501)), // both legs
      (2L, null, vec(502)), (2L, null, vec(502)),         // vector only
      (3L, words(3), null), (3L, words(6), null))         // lexical only
    val q = rows.toDF("qid", "term", "qvec")
    for (fused <- Seq(
      Hybrid.servedTopK(spark, bm25Dir, ivfDir, q, kLeg, k, nprobe = cents.length),
      Hybrid.hybridTopK(corpus.toDF("doc_id", "text", "vec"),
        "doc_id", "text", "vec", q, kLeg, k))) {
      val byQid = fused.collect().map(_.getLong(0)).toSet
      assert(byQid == Set(1L, 2L, 3L),
        s"every qid must serve on whichever leg has valid inputs, got $byQid")
    }
    // and served == batch on this frame too (parity holds under nulls)
    assert(Hybrid.servedTopK(spark, bm25Dir, ivfDir, q, kLeg, k,
        nprobe = cents.length).orderBy("qid", "rank").collect().map(_.toSeq).toSeq ==
      Hybrid.hybridTopK(corpus.toDF("doc_id", "text", "vec"),
        "doc_id", "text", "vec", q, kLeg, k)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq)
  }

  test("serveStream retention: keepEpochs bounds the output dir, latest epoch intact") {
    val (bm25Dir, ivfDir) = buildIndexes()
    val dropDir = Files.createTempDirectory("hsrvretdrop").toString
    val outDir = Files.createTempDirectory("hsrvretout").toString
    val ckpt = Files.createTempDirectory("hsrvretckpt").toString
    val perEpoch = Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L), Seq(5L))
    perEpoch.foreach(qs => queryRows(qs).toDF("qid", "term", "qvec")
      .coalesce(1).write.mode("append").parquet(dropDir))
    val qy = HybridStream.serveStream(
      spark.readStream.schema("qid LONG, term STRING, qvec ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(dropDir),
      bm25Dir, ivfDir, kLeg, k, nprobe = cents.length, outDir, ckpt,
      keepEpochs = 2)
    try assert(StreamSync.drain(qy) {
      new java.io.File(s"$outDir/epoch=4/_SUCCESS").exists()
    }) finally qy.stop()
    val held = new java.io.File(outDir).listFiles().map(_.getName)
      .filter(_.startsWith("epoch=")).toSet
    assert(held == Set("epoch=3", "epoch=4"),
      s"a 5-epoch stream at keepEpochs=2 must hold the latest two, got $held")
    // the surviving latest epoch is a complete, correct answer
    assert(spark.read.parquet(s"$outDir/epoch=4")
        .select(col("qid"), col("doc_id"), col("rrf"), col("rank"))
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq ==
      Hybrid.servedTopK(spark, bm25Dir, ivfDir,
          queryRows(Seq(5L)).toDF("qid", "term", "qvec"), kLeg, k,
          nprobe = cents.length)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq)
  }

  test("streamed query batches == one-shot served batch; appends land between epochs") {
    // fused depth 10 > kLeg: vector-leg ranks 4-5 (where the appended
    // cosine-1.0 ties land after the old 1.0 ties win on id) are
    // visible in the fused list, so the append observably changes it
    val k = 10
    val (bm25Dir, ivfDir) = buildIndexes()
    val dropDir = Files.createTempDirectory("hsrvdrop").toString
    val outDir = Files.createTempDirectory("hsrvout").toString
    val ckpt = Files.createTempDirectory("hsrvckpt").toString
    val epochs = Seq(Seq(1L, 2L), Seq(3L))
    epochs.foreach(qs => queryRows(qs).toDF("qid", "term", "qvec")
      .coalesce(1).write.mode("append").parquet(dropDir))
    def startStream() = HybridStream.serveStream(
      spark.readStream.schema("qid LONG, term STRING, qvec ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(dropDir),
      bm25Dir, ivfDir, kLeg, k, nprobe = cents.length, outDir, ckpt)
    val qy = startStream()
    try assert(StreamSync.drain(qy) {
      new java.io.File(s"$outDir/epoch=1/_SUCCESS").exists()
    }) finally qy.stop()

    val got = spark.read.parquet(outDir)
      .select(col("qid"), col("doc_id"), col("rrf"), col("rank"))
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val oneShot = Hybrid.servedTopK(spark, bm25Dir, ivfDir,
        queryRows(Seq(1L, 2L, 3L)).toDF("qid", "term", "qvec"),
        kLeg, k, nprobe = cents.length)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(got == oneShot && got.nonEmpty,
      "epoch-by-epoch serve must equal the one-shot served batch")

    // grow BOTH indexes, then stream one more epoch from the same
    // checkpoint: the new serve re-pins the manifests and sees the
    // appended docs — the indexes are the state, nothing is frozen
    // appended vectors sit AT qid 1's query vector (cosine 1.0), so the
    // grown index must surface them — the pickup assertion is not vacuous
    val extra = (200 until 210).map(i => (i.toLong, s"${words(i % 3)} zebra", vec(501)))
    Bm25.appendToIndex(spark, bm25Dir,
      extra.map(e => (e._1, e._2)).toDF("doc_id", "text"), "doc_id", "text")
    Ann.ivfIndexAppend(spark, ivfDir,
      extra.map(e => (e._1, e._3)).toDF("cid", "cvec"))
    queryRows(Seq(1L)).toDF("qid", "term", "qvec")
      .coalesce(1).write.mode("append").parquet(dropDir)
    val qy2 = startStream()
    try assert(StreamSync.drain(qy2) {
      new java.io.File(s"$outDir/epoch=2/_SUCCESS").exists()
    }) finally qy2.stop()
    val epoch2 = spark.read.parquet(s"$outDir/epoch=2")
      .select(col("qid"), col("doc_id"), col("rrf"), col("rank"))
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val grown = Hybrid.servedTopK(spark, bm25Dir, ivfDir,
        queryRows(Seq(1L)).toDF("qid", "term", "qvec"),
        kLeg, k, nprobe = cents.length)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(epoch2 == grown,
      "a post-append epoch must serve from the grown indexes")
    // the pickup is not vacuous: the appended mass (cosine 1.0 against
    // qid 1, displacing its old vector-leg ranks 4-5) must CHANGE
    // qid 1's fused answer vs the pre-append epoch AND surface
    val qid1Before = got.filter(_.head == 1L)
    assert(qid1Before.nonEmpty && epoch2 != qid1Before,
      "the post-append serve must differ from the pre-append one")
    assert(epoch2.exists(r => { val id = r(1).asInstanceOf[Long]; id >= 200L }),
      "appended docs must be retrievable in the new epoch")
  }
}
