package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BudgetedDoc, SourceBudgetStream}

/** Streaming token-budget source gate: per-source admission until the
  * running token count crosses the budget, saturation persists across
  * micro-batches, and a dropped document still advances the counter
  * (batch sourceMix semantics transposed to arrival order).
  *
  * The operator runs on TimeMode.None (no timers, no TTL), so
  * [[StreamSync.drain]]'s `processAllAvailable()` is a deterministic
  * wait — no wall-clock polling.
  */
class SourceBudgetStreamSpec extends AnyFunSuite {

  test("per-source budget: admit until saturated, stay saturated across batches") {
    val spark = SparkTest.spark
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      def words(n: Int) = Seq.fill(n)("w").mkString(" ")
      val input = MemoryStream[(Long, String, String)]
      // budget 5 tokens per source
      val q = SourceBudgetStream.gate(
        input.toDS().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", tokenBudget = 5L)
        .writeStream.format("memory").queryName("budget_gate")
        .outputMode("append").start()
      try {
        // batch 1: src a consumes 2+2 = 4 of 5; src b admits 3 of 5
        input.addData((1L, words(2), "a"), (2L, words(2), "a"), (3L, words(3), "b"))
        assert(StreamSync.drain(q) {
          spark.sql("SELECT * FROM budget_gate").count() == 3
        })
        // batch 2: doc 4 (3 tokens) overflows src a at 7 > 5 → dropped,
        // but the counter ADVANCED — doc 5 (1 token) lands at 8 > 5 and
        // is dropped too, exactly like the batch running-total filter.
        // src b admits doc 6 (2 tokens, cum 5 == budget: inclusive).
        input.addData((4L, words(3), "a"), (5L, words(1), "a"), (6L, words(2), "b"))
        assert(StreamSync.drain(q) {
          spark.sql("SELECT * FROM budget_gate").count() == 4
        })
        val kept = spark.sql("SELECT * FROM budget_gate").as[BudgetedDoc]
          .collect().sortBy(_.docId).toSeq
        assert(kept == Seq(
          BudgetedDoc(1L, "a", 2L, 2L),
          BudgetedDoc(2L, "a", 2L, 4L),
          BudgetedDoc(3L, "b", 3L, 3L),
          BudgetedDoc(6L, "b", 2L, 5L)))
        // batch 3: src a stays saturated in a later batch; a fresh
        // source admits normally
        input.addData((7L, words(1), "a"), (8L, words(4), "c"))
        assert(StreamSync.drain(q) {
          spark.sql("SELECT * FROM budget_gate").count() == 5
        })
        assert(spark.sql("SELECT * FROM budget_gate WHERE source = 'a'").count() == 2)
        assert(spark.sql("SELECT * FROM budget_gate WHERE docId = 8").count() == 1)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("gateBpe prices documents in trained-tokenizer symbols, not whitespace tokens") {
    val spark = SparkTest.spark
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      // textbook merges (BpeSpec): (u,g), (u,n), (h,ug) →
      // "hug" = 1 symbol, "bug" = [b, ug] = 2 symbols
      val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"))
      val input = MemoryStream[(Long, String, String)]
      val q = graft.streaming.SourceBudgetStream.gateBpe(
        input.toDS().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", tokenBudget = 5L, merges)
        .writeStream.format("memory").queryName("budget_gate_bpe")
        .outputMode("append").start()
      try {
        // doc 1 = 3 symbols (hug bug), doc 2 = 2 symbols (bug): cum 5
        // == budget admits both; doc 3 (1 ws-token but 2 symbols)
        // overflows at 7 — a whitespace gate at the same budget would
        // have admitted it (3+2+1 ws-tokens ≤ 5... wait: doc1 is 2
        // ws-tokens, doc2 1, doc3 1 → ws cum 4 ≤ 5 admits all three)
        input.addData((1L, "hug bug", "a"), (2L, "bug", "a"), (3L, "bug", "a"))
        assert(StreamSync.drain(q) {
          spark.sql("SELECT * FROM budget_gate_bpe").count() == 2
        })
        val kept = spark.sql("SELECT * FROM budget_gate_bpe")
          .as[graft.streaming.BudgetedDoc].collect().sortBy(_.docId).toSeq
        assert(kept == Seq(
          graft.streaming.BudgetedDoc(1L, "a", 3L, 3L),
          graft.streaming.BudgetedDoc(2L, "a", 2L, 5L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
