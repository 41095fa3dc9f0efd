package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BigramLm, Quality}
import graft.streaming.{QualityGateStream, QualityTiered}

/** Streaming quality-tier gate: offline-trained tiers (batch pplBuckets
  * cut points + pruned LM), online stateless assignment. The gate has
  * no state and no processing-time semantics, so [[StreamSync.drain]]'s
  * `processAllAvailable()` is a deterministic wait.
  */
class QualityGateStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the cat sat on the hat",
    3L -> "a dog ran through a park",
    4L -> "quantum flux harmonics destabilize rapidly",
    5L -> "the cat ran through the park",
    6L -> "a dog sat on a mat",
    7L -> "flux cat quantum mat",
    8L -> "the the the the",
    9L -> "park dog hat cat")

  test("unpruned model scores bit-identical to the batch LM; tiers follow the cuts") {
    val docs = corpus.toDF("doc_id", "text")
    val model = QualityGateStream.trainModel(docs, "doc_id", "text", maxEntries = 10000)
    val pairs = QualityGateStream.thresholds(docs, "doc_id", "text", buckets = 3)
    // cuts carry their true bucket ids (2..k on a corpus that fills
    // every bucket) and ascend in value
    assert(pairs.map(_._1).sameElements(Array(1L, 2L)))
    val cuts = pairs.map(_._2)
    assert(cuts.length == 2 && cuts.sorted.sameElements(cuts))
    val batch = Quality.pplBuckets(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = QualityGateStream.gate(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", model, pairs)
      .writeStream.format("memory").queryName("quality_gate")
      .outputMode("append").start()
    try {
      input.addData(corpus: _*)
      // a sub-2-token doc carries no score and must be dropped
      input.addData(10L -> "solitary")
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM quality_gate").count() == corpus.size
      })
      val got = spark.sql("SELECT * FROM quality_gate").as[QualityTiered]
        .collect().map(t => t.docId -> t).toMap
      assert(!got.contains(10L))
      for ((id, (lmMean, bucket)) <- batch) {
        assert(got(id).lmMean == lmMean,
          s"doc $id: stream score ${got(id).lmMean} != batch $lmMean")
        val valueTier = cuts.count(_ <= lmMean)
        assert(got(id).tier == valueTier)
        // away from boundary ties, the value rule IS the batch bucket
        if (!cuts.contains(lmMean))
          assert(got(id).tier == bucket,
            s"doc $id: tier ${got(id).tier} != batch bucket $bucket")
      }
    } finally q.stop()
  }

  test("random corpora: unpruned model score == batch LM score for every doc") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("a", "b", "c", "dd")
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    var s = org.scalacheck.rng.Seed(99L)
    for (round <- 0 until 5) {
      val texts = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))
        .apply(Gen.Parameters.default, s).get
      s = s.next
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val model = QualityGateStream.trainModel(docs, "doc_id", "text", maxEntries = 100000)
      val batch = BigramLm.scores(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      for ((t, i) <- texts.zipWithIndex)
        assert(model.lmMean(t) == batch.get(i.toLong),
          s"round $round doc $i text '$t' corpus $texts")
    }
  }

  test("gate assigns TRUE batch bucket ids when the training corpus left buckets empty") {
    // 2 scored docs into 4 buckets leaves buckets 1 and 3 empty — the
    // only cut carries bucket id 2, and a doc at/above it must be
    // tiered 2, not 1 (counting cuts would renumber it)
    val docs = Seq(8L -> "the the the the", 9L -> "park dog hat cat")
      .toDF("doc_id", "text")
    val model = QualityGateStream.trainModel(docs, "doc_id", "text", maxEntries = 10000)
    val pairs = QualityGateStream.thresholds(docs, "doc_id", "text", buckets = 4)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = QualityGateStream.gate(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", model, pairs)
      .writeStream.format("memory").queryName("quality_gate_sparse")
      .outputMode("append").start()
    try {
      input.addData(Seq(8L -> "the the the the", 9L -> "park dog hat cat"): _*)
      assert(StreamSync.drain(q) {
        spark.sql("SELECT * FROM quality_gate_sparse").count() == 2
      })
      val tiers = spark.sql("SELECT * FROM quality_gate_sparse").as[QualityTiered]
        .collect().map(t => t.docId -> t.tier).toMap
      val batch = Quality.pplBuckets(docs, "doc_id", "text", 4)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      for ((id, bucket) <- batch)
        assert(tiers(id).toLong == bucket,
          s"doc $id: stream tier ${tiers(id)} != batch bucket $bucket")
    } finally q.stop()
  }

  test("thresholds label cuts by TRUE bucket id when small corpora leave buckets empty") {
    // 2 scored docs into 4 buckets: rank 1 → bucket 0, rank 2 → bucket
    // (2-1)*4 div 2 = 2 — buckets 1 and 3 are empty. The one cut must
    // be labeled by its real bucket (2), not re-numbered to 1 by
    // position (the pre-fix SQL surface did exactly that).
    val docs = Seq(8L -> "the the the the", 9L -> "park dog hat cat")
      .toDF("doc_id", "text")
    val pairs = QualityGateStream.thresholds(docs, "doc_id", "text", buckets = 4)
    assert(pairs.map(_._1).sameElements(Array(2L)), pairs.toSeq)
    val batchMin = Quality.pplBuckets(docs, "doc_id", "text", 4)
      .filter(org.apache.spark.sql.functions.col("bucket") === 2L)
      .collect().map(_.getLong(1)).min
    assert(pairs.head._2 == batchMin)
  }

  test("fully pruned model scores every bigram at the unseen floor Scale/V") {
    val docs = corpus.toDF("doc_id", "text")
    val empty = QualityGateStream.trainModel(docs, "doc_id", "text", maxEntries = 0)
    assert(empty.v > 0 && empty.c1.isEmpty && empty.c2.isEmpty)
    // add-one smoothing with all counts pruned: p = (0+1)*Scale/(0+V)
    val floor = BigramLm.Scale / empty.v
    assert(empty.lmMean("alpha beta gamma").contains(floor))
    assert(empty.lmMean("one").isEmpty)
  }
}
