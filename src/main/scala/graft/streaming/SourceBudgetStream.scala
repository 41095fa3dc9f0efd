package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** A kept document with its source's inclusive running token count. */
case class BudgetedDoc(docId: Long, source: String, nTokens: Long, cumTokens: Long)

private[streaming] case class BudgetEvent(docId: Long, source: String, nTokens: Long)

/** Streaming token-budget source gate — the ingestion-time analog of
  * [[graft.operators.Layout.sourceMix]] (the round-4 batch operator):
  * documents flow in per source and are admitted until the source's
  * INCLUSIVE running token count exceeds the budget, after which the
  * source is saturated and everything else from it is dropped.
  *
  * Semantics match the batch operator's filter exactly, transposed to
  * arrival order: every document — kept or dropped — advances the
  * counter, so a later small document cannot "fit into" a budget an
  * earlier large one overflowed (the batch `cum_tokens <= budget` on a
  * running total behaves the same way along its hash order). The batch
  * pass remains the reproducible, order-stable layout step; the stream
  * gate is what a live ingestion front-end runs to stop PAYING for
  * over-represented sources (tokenize-and-discard is still work — the
  * gate stops the downstream pipeline, storage and training cost).
  *
  * Scale: state is ONE Long per source (ValueState, no TTL — a
  * saturated source must stay saturated); the shuffle is the
  * groupByKey(source) exchange of (docId, source, nTokens) triples —
  * the text itself is dropped to a token count inside the scan
  * projection and never shuffles. Source cardinality (≤ thousands)
  * bounds both state and skew; a single mega-source keys one task,
  * which is exactly the sequential-counter semantics a budget needs.
  * Requires the RocksDB state store provider, like every
  * transformWithState operator here.
  */
class SourceBudgetProcessor(tokenBudget: Long)
    extends StatefulProcessor[String, BudgetEvent, BudgetedDoc] {

  @transient private var cum: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[BudgetEvent],
      timerValues: TimerValues): Iterator[BudgetedDoc] = {
    val out = Seq.newBuilder[BudgetedDoc]
    var c = if (cum.exists()) cum.get() else 0L
    // deterministic within-batch order (micro-batch rows arrive in
    // partition order): doc id, matching the spec fixtures
    for (ev <- rows.toSeq.sortBy(_.docId)) {
      c += ev.nTokens
      if (c <= tokenBudget) out += BudgetedDoc(ev.docId, key, ev.nTokens, c)
    }
    cum.update(c)
    out.result().iterator
  }
}

object SourceBudgetStream {

  /** Gate a streaming documents frame (`idCol`, `sourceCol`, `textCol`)
    * at `tokenBudget` tokens per source. Tokenization is the shared
    * whitespace kernel ([[graft.functions.TextFunctions.tokens]], the
    * same regex as `Dedup.wsTokens`), applied in the scan projection so
    * only counts shuffle. */
  def gate(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      tokenBudget: Long): Dataset[BudgetedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    gated(docs.select(
      col(idCol).cast("long").as("docId"),
      col(sourceCol).as("source"),
      size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("nTokens"))
      .as[BudgetEvent], tokenBudget)
  }

  /** [[gate]] priced in TRAINED-TOKENIZER symbols instead of whitespace
    * tokens — the streaming analog of
    * [[graft.operators.Layout.sourceMixBpe]]: what the budget caps is
    * what the trainer actually pays. The merge list ships once per
    * executor as a broadcast rank table; counting is a narrow typed
    * projection before the same per-source counter. */
  def gateBpe(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      tokenBudget: Long, merges: Seq[(String, String)]): Dataset[BudgetedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksBc = spark.sparkContext.broadcast(graft.operators.Bpe.rankTable(merges))
    gated(docs
      .select(col(idCol).cast("long"), col(sourceCol), col(textCol))
      .as[(Long, String, String)]
      .map { case (id, source, text) =>
        var n = 0L
        graft.operators.Dedup.wsTokens(text).foreach(w =>
          n += graft.operators.Bpe.countSymbols(w, ranksBc.value))
        BudgetEvent(id, source, n)
      }, tokenBudget)
  }

  private def gated(events: Dataset[BudgetEvent], tokenBudget: Long): Dataset[BudgetedDoc] = {
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val outEnc: org.apache.spark.sql.Encoder[BudgetedDoc] = Encoders.product[BudgetedDoc]
    events
      .groupByKey(_.source)
      // TimeMode.None: the processor registers no timers and uses no
      // TTL, and ProcessingTime would make the engine commit an epoch
      // every trigger — processAllAvailable never quiesces and callers
      // are pushed into wall-clock polling (see StreamSync's scaladoc)
      .transformWithState(new SourceBudgetProcessor(tokenBudget),
        TimeMode.None(), OutputMode.Append())
  }
}
