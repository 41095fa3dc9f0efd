package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.{Bm25, Dedup}

/** A stream document's BM25 hit against one eval query. `score` is in
  * [[graft.operators.Bm25.ScoreScale]] fixed-point units (score·10⁶),
  * the batch kernel's integer domain. */
case class Bm25Hit(docId: Long, qid: Long, score: Long)

/** Streaming retrieval-based decontamination gate — the deployment
  * shape of [[graft.operators.Bm25]]: the eval/benchmark queries and
  * the corpus statistics they score against (doc count, average
  * length, per-term document frequency) are TRAINED offline on the
  * reference corpus, broadcast, and applied online as a completely
  * STATELESS narrow map — each arriving training document is scored
  * against every eval query and emitted when any score clears the
  * threshold. No shuffle, no state store, nothing to time out — the
  * same train-offline/broadcast/gate shape as [[BoilerplateStream]]
  * and [[CrossDedupStream]], with BM25 lexical overlap as the
  * similarity instead of n-gram identity.
  *
  * Deviations, stated plainly: (1) statistics are frozen at training
  * time — df/avgdl drift in the stream does not move the scores
  * (retrain and re-broadcast on the batch side, as such pipelines
  * actually operate); (2) the arriving document's OWN length feeds the
  * length normalization (that part is per-document, not corpus state).
  * Scores live in the batch kernel's 10⁶ fixed-point integer domain —
  * order-independent sums, bit-exact parity asserted in the spec.
  */
object Bm25Stream {

  /** Frozen scoring model: corpus stats + per-term df for the eval
    * queries' terms (post stopword-prune), driver-sized by
    * construction — bounded by the query set, never the corpus. */
  case class Bm25Model(n: Long, avgdl: Double, df: Map[String, Long],
      queries: Map[Long, Seq[String]])

  /** Offline training against the reference corpus: collects the
    * (bounded, loudly-guarded) query set, computes n/avgdl and each
    * query term's df, and applies [[Bm25]]'s ≥80%-df stopword prune so
    * the gate scores exactly what the batch kernel would. */
  def train(ref: DataFrame, idCol: String, textCol: String,
      queries: DataFrame): Bm25Model = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val q = queries.select(col("qid").cast("long").as("qid"), col("term").as("t"))
      .distinct()
    val qRows = q.limit(Bm25.MaxServeTerms + 1).collect()
    require(qRows.length <= Bm25.MaxServeTerms,
      s"bm25 stream train: query set exceeds ${Bm25.MaxServeTerms} rows — " +
        "the model broadcasts to every executor; shrink or batch the eval set")
    val qmap = qRows.map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (qid, ts) => qid -> ts.map(_._2).toSeq.distinct.sorted }
    val terms = qRows.map(_.getString(1)).distinct.toSeq

    val dl = ref.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val statsRow = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).collect().head
    val n = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / n
    val dfRows = ref.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .filter(col("t").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val df = dfRows.toMap.filter { case (_, d) =>
      d * Bm25.PruneDfDen < n * Bm25.PruneDfNum }
    Bm25Model(n, avgdl, df, qmap)
  }

  /** The exact per-term arithmetic of `Bm25.termScoreFp`, replayed on
    * JVM doubles in the same operation order then floored into the same
    * 10⁶ fixed-point domain — codegen'd Column math and this method run
    * the same JVM double ops, so the results are bit-identical. */
  private def termScoreFp(tf: Long, df: Long, n: Long, dl: Long, avgdl: Double): Long =
    math.floor((((n - df + 0.5) / (df + 0.5)) * (tf * Bm25.K1Plus1) /
      (tf + Bm25.K1 * (Bm25.OneMinusB + Bm25.B * (dl.toDouble / avgdl))))
      * 1000000.0).toLong

  /** Score one document against the model — per query: integer sum of
    * fixed-point per-term scores (the batch kernel's exact domain),
    * emitted when ≥ `threshold` (also in score·10⁶ units). */
  private[streaming] def scoreDoc(id: Long, text: String, m: Bm25Model,
      threshold: Long): Iterator[Bm25Hit] = {
    val toks = Dedup.wsTokens(text)
    val dl = toks.length.toLong
    val tf = new scala.collection.mutable.HashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (m.df.contains(t)) tf.update(t, tf.getOrElse(t, 0L) + 1L)
      i += 1
    }
    if (tf.isEmpty) Iterator.empty
    else m.queries.iterator.flatMap { case (qid, terms) =>
      val present = terms.filter(tf.contains)
      if (present.isEmpty) None
      else {
        val score = present.foldLeft(0L)((a, t) =>
          a + termScoreFp(tf(t), m.df(t), m.n, dl, m.avgdl))
        if (score >= threshold) Some(Bm25Hit(id, qid, score)) else None
      }
    }
  }

  /** Stateless gate: emit a [[Bm25Hit]] for every (arriving doc, eval
    * query) pair whose BM25 score clears `threshold` (score·10⁶
    * fixed-point units). Works on a batch or streaming `docs` frame
    * identically. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      model: Bm25Model, threshold: Long): Dataset[Bm25Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) => scoreDoc(id, text, bc.value, threshold) }
  }
}
