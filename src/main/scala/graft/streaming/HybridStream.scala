package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Ann, Bm25, Hybrid}

/** One arriving document's evidence against one frozen query: the BM25
  * fixed-point score when the doc shares a scorable term with the
  * query (`hasLex`), and its exact cosine against the query vector
  * (every non-self doc has one — the vector leg is the brute exact
  * baseline, like batch t48). */
case class HybridArrival(qid: Long, docId: Long, lex: Long, hasLex: Boolean,
    cosine: Double)

/** One row of a query's CURRENT fused top-k after a micro-batch:
  * `docsSeen` is the total candidate docs folded into this query's
  * state so far — monotone per qid, so a consumer (and the parity
  * spec) selects each query's latest snapshot by max `docsSeen`. */
case class FusedSnapshot(qid: Long, docId: Long, rrf: Long, rank: Long,
    docsSeen: Long)

/** Per-query bounded retrieval state: the running top-`kLeg` of each
  * leg. `lexIds`/`lexScores` (resp. `vecIds`/`vecCosines`) are
  * parallel arrays sorted by the leg's rank order — score desc, docId
  * asc (resp. cosine desc, docId asc) — the exact tie-break every
  * batch leg uses. */
case class HybridState(lexIds: Seq[Long], lexScores: Seq[Long],
    vecIds: Seq[Long], vecCosines: Seq[Double], docsSeen: Long)

/** Streaming hybrid retrieval — the batch/stream symmetry closer for
  * the retrieval family ([[graft.operators.Hybrid.hybridTopK]] is the
  * batch shape): eval queries and the corpus statistics their lexical
  * leg scores against are TRAINED offline ([[Bm25Stream.train]] — the
  * same frozen-stats deviation, stated there), broadcast with the
  * query vectors, and applied online in two steps:
  *
  *   1. a STATELESS narrow map scores each arriving document against
  *      every query on both modalities — integer fixed-point BM25
  *      (bit-identical to the batch kernel) and exact cosine (the
  *      same sequential-fold double as the codegen'd column);
  *   2. a bounded per-query state (`flatMapGroupsWithState`, no
  *      timeout, no processing-time semantics) folds candidates into
  *      each leg's running top-`kLeg` and emits the query's current
  *      RRF-fused top-`k` — integer fusion with the batch constants
  *      ([[Hybrid.RrfKappa]]/[[Hybrid.RrfScale]]), so after the last
  *      arrival the snapshot equals `hybridTopK` over the arrivals'
  *      totality row-for-row.
  *
  * Scale shape: state is queries × kLeg × 2 entries — eval-set-sized,
  * never corpus-sized; each arrival costs |queries| score rows (the
  * same brute gate as [[Bm25Stream]]/[[AnnStream]], which is the
  * decontamination-serving deployment: eval sets are small, corpora
  * are not). Self pairs (docId == qid) are excluded like both batch
  * legs do. Re-delivered document ids (re-crawls, at-least-once
  * replays) are IDEMPOTENT in the state — one entry per docId per
  * leg, best score wins — a deliberate deviation from feeding a batch
  * frame literal duplicate rows (where the exact vector leg would
  * rank both copies). */
object HybridStream {

  /** Frozen two-leg scoring model: the BM25 gate model + each query's
    * vector, and the retrieval depths. Driver-sized by the same loud
    * guard as [[Bm25Stream.train]]. */
  case class HybridModel(bm25: Bm25Stream.Bm25Model,
      queryVecs: Map[Long, Array[Float]], kLeg: Int, k: Int)

  /** Offline training: BM25 stats/df against the reference corpus for
    * the queries' terms, plus the collected (qid → qvec) map.
    * `queries` carries (qid, term, qvec) rows — the batch
    * [[Hybrid.hybridTopK]] contract, vector repeated per term row. */
  def train(ref: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, kLeg: Int, k: Int): HybridModel = {
    import org.apache.spark.sql.functions._
    require(kLeg > 0 && k > 0, s"depths must be positive, got kLeg=$kLeg k=$k")
    val bm25 = Bm25Stream.train(ref, idCol, textCol,
      queries.select(col("qid"), col("term")))
    val spark = queries.sparkSession
    import spark.implicits._
    val vecRows = queries.select(col("qid").cast("long"), col("qvec"))
      .filter(col("qid").isNotNull && col("qvec").isNotNull)
      .groupBy(col("qid")).agg(first(col("qvec")).as("qvec"))
      .as[(Long, Array[Float])]
      .collect()
    HybridModel(bm25, vecRows.toMap, kLeg, k)
  }

  /** Insert into a bounded rank-ordered list: `better(a, b)` = a
    * strictly outranks b. Returns the top-`bound` under that order.
    * IDEMPOTENT per document id: a re-delivered docId (an upstream
    * re-crawl or at-least-once replay) either loses to its existing
    * entry (no-op) or replaces it — the state can never hold one
    * document twice, so replays cannot inflate a doc's RRF total. */
  private def insertBounded(xs: Seq[(Long, Long)], x: (Long, Long), bound: Int)(
      better: ((Long, Long), (Long, Long)) => Boolean): Seq[(Long, Long)] =
    insertBoundedBy[(Long, Long)](xs, x, bound)(better, _._1)

  private def insertBoundedV(xs: Seq[(Long, Double)], x: (Long, Double), bound: Int)(
      better: ((Long, Double), (Long, Double)) => Boolean): Seq[(Long, Double)] =
    insertBoundedBy[(Long, Double)](xs, x, bound)(better, _._1)

  private def insertBoundedBy[T](xs0: Seq[T], x: T, bound: Int)(
      better: (T, T) => Boolean, idOf: T => Long): Seq[T] = {
    val existing = xs0.find(e => idOf(e) == idOf(x))
    if (existing.exists(e => !better(x, e))) return xs0 // dominated replay: no-op
    val xs = existing.map(e => xs0.filterNot(_ == e)).getOrElse(xs0)
    val i = xs.indexWhere(e => better(x, e))
    val at = if (i < 0) xs.length else i
    if (at >= bound) xs
    else (xs.take(at) :+ x) ++ xs.drop(at).take(bound - at - 1)
  }

  private def lexBetter(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def vecBetter(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** The integer RRF fusion of the state's two ranked legs —
    * [[Hybrid.rrfFuse]]'s arithmetic on the driver-sized snapshot:
    * contribution floor(RrfScale/(κ+rank)) per leg, summed, ranked by
    * (rrf desc, docId asc), cut to `k`. */
  private[streaming] def fuseState(st: HybridState, k: Int): Seq[(Long, Long)] = {
    val contrib = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    def add(ids: Seq[Long]): Unit = ids.zipWithIndex.foreach { case (id, i) =>
      val c = Hybrid.RrfScale / (Hybrid.RrfKappa + (i + 1))
      contrib.update(id, contrib.getOrElse(id, 0L) + c)
    }
    add(st.lexIds)
    add(st.vecIds)
    contrib.toSeq
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      .take(k)
  }

  private def updateGroup(model: HybridModel)(qid: Long,
      rows: Iterator[HybridArrival],
      state: GroupState[HybridState]): Iterator[FusedSnapshot] = {
    var st = state.getOption.getOrElse(HybridState(Nil, Nil, Nil, Nil, 0L))
    var lex = st.lexIds.zip(st.lexScores)
    var vec = st.vecIds.zip(st.vecCosines)
    var seen = st.docsSeen
    rows.foreach { a =>
      seen += 1 // progress counter (candidate rows folded), not distinct docs
      if (a.hasLex) lex = insertBounded(lex, (a.docId, a.lex), model.kLeg)(lexBetter)
      vec = insertBoundedV(vec, (a.docId, a.cosine), model.kLeg)(vecBetter)
    }
    st = HybridState(lex.map(_._1), lex.map(_._2),
      vec.map(_._1), vec.map(_._2), seen)
    state.update(st)
    fuseState(st, model.k).zipWithIndex.iterator.map { case ((id, rrf), i) =>
      FusedSnapshot(qid, id, rrf, i + 1L, seen)
    }
  }

  /** Stateless candidate scoring: one [[HybridArrival]] per (arriving
    * doc, query) pair, self pairs excluded. Package-visible for the
    * parity spec's leg-level checks. */
  private[streaming] def arrivals(docs: DataFrame, idCol: String,
      textCol: String, vecCol: String, model: HybridModel): Dataset[HybridArrival] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), col(textCol), col(vecCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        col(vecCol).isNotNull)
      .as[(Long, String, Array[Float])]
      .flatMap { case (docId, text, dvec) =>
        val m = bc.value
        // every query's lexical verdict in one tokenize pass
        val lexByQid = Bm25Stream.scoreDoc(docId, text, m.bm25, Long.MinValue)
          .map(h => h.qid -> h.score).toMap
        m.queryVecs.iterator.collect {
          case (qid, qvec) if qid != docId =>
            val lex = lexByQid.get(qid)
            HybridArrival(qid, docId, lex.getOrElse(0L), lex.isDefined,
              Ann.cosineD(qvec, dvec))
        }
      }
  }

  /** stream(`idCol`, `textCol`, `vecCol`) → per-query fused top-k
    * snapshots, updated every micro-batch (Update output mode). Works
    * identically on a batch frame (one snapshot per query). */
  def topK(docs: DataFrame, idCol: String, textCol: String, vecCol: String,
      model: HybridModel): Dataset[FusedSnapshot] = {
    val spark = docs.sparkSession
    import spark.implicits._
    arrivals(docs, idCol, textCol, vecCol, model)
      .groupByKey(_.qid)
      .flatMapGroupsWithState[HybridState, FusedSnapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateGroup(model))
  }

  /** The foreachBatch sink body of [[serveStream]]: one committed-index
    * hybrid serve per micro-batch, results landing as
    * `outDir/epoch=<id>` in overwrite mode — a re-delivered epoch
    * REWRITES its own directory, so at-least-once delivery cannot
    * duplicate output rows (if an index tick committed between the
    * original run and the retry, the rewrite serves the newer commit —
    * still one consistent answer per epoch). */
  def serveSink(bm25Dir: String, ivfDir: String, kLeg: Int, k: Int,
      nprobe: Int, outDir: String,
      keepEpochs: Int = 0): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      val served = Hybrid.servedTopKVersioned(batch.sparkSession,
        bm25Dir, ivfDir, batch, kLeg, k, nprobe)
      served.results
        .write.mode("overwrite").parquet(s"$outDir/epoch=$epoch")
      // tag the epoch with the committed index versions both legs
      // pinned (underscore-prefixed: parquet readers ignore it) — with
      // the *_version time-travel serves this makes any epoch's answer
      // REPLAYABLE as long as the vacuum grace window keeps the
      // versions ([[Hybrid.servedTopKVersion]], [[epochIndexVersions]])
      graft.operators.ManifestIO.writeText(
        graft.operators.ManifestIO.fs(batch.sparkSession, outDir),
        new org.apache.hadoop.fs.Path(
          s"$outDir/epoch=$epoch/_index_versions.txt"),
        s"bm25=${served.bm25Version}\nivf=${served.ivfVersion}\n")
      // RETENTION: a long-running query stream would otherwise
      // accumulate one epoch dir per micro-batch without bound. With
      // keepEpochs > 0, prune every epoch dir whose id trails the
      // current epoch by keepEpochs or more — idempotent (a
      // re-delivered epoch re-makes the same decision; deleting
      // deleted dirs is a no-op) and the current epoch's dir is by
      // construction never in range, so the latest answer survives.
      if (keepEpochs > 0) {
        val fs = graft.operators.ManifestIO.fs(batch.sparkSession, outDir)
        val root = new org.apache.hadoop.fs.Path(outDir)
        if (fs.exists(root)) fs.listStatus(root).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("epoch=")) {
            val id = scala.util.Try(n.stripPrefix("epoch=").toLong).toOption
            if (id.exists(_ <= epoch - keepEpochs)) fs.delete(st.getPath, true)
          }
        }
      }
    }

  /** The (bm25, ivf) committed index versions a [[serveSink]] epoch
    * pinned — read back from the epoch dir's tag, for the replay read
    * ([[Hybrid.servedTopKVersion]]). */
  def epochIndexVersions(spark: org.apache.spark.sql.SparkSession,
      outDir: String, epoch: Long): (Long, Long) = {
    val f = graft.operators.ManifestIO.fs(spark, outDir)
    val tag = new org.apache.hadoop.fs.Path(
      s"$outDir/epoch=$epoch/_index_versions.txt")
    // the sink writes the tag AFTER the epoch parquet, so a writer
    // crash between the two leaves a readable-looking epoch dir with
    // no tag — a PARTIAL epoch, not a bug: the stream's at-least-once
    // re-delivery rewrites both. Name that state instead of
    // surfacing a raw FileNotFoundException.
    require(f.exists(tag),
      s"epoch $epoch at $outDir has no _index_versions.txt tag — the " +
        "epoch is PARTIAL (writer died between the parquet write and " +
        "the tag); it heals when the stream re-delivers the epoch")
    val kv = graft.operators.ManifestIO.parseKv(
      graft.operators.ManifestIO.readText(f, tag))
    (kv("bm25").toLong, kv("ivf").toLong)
  }

  /** Served streaming hybrid retrieval — the committed-index sibling of
    * [[topK]], closing the other half of the batch/stream symmetry:
    * [[topK]] freezes an EVAL-SIZED query set offline and scores every
    * arriving document against it (state = queries × kLeg); this one
    * streams CORPUS-SCALE query batches against the standing committed
    * indexes ([[Hybrid.servedTopK]] per micro-batch — the BM25 leg
    * re-pins stats + postings from the index manifest EVERY micro-batch,
    * the vector leg probes only its queries' `nprobe` committed IVF
    * cells), so index growth from a concurrent
    * [[IndexMaintain]] stream is picked up at the next micro-batch and
    * no query state is held at all (the indexes ARE the state).
    * `queries` carries (qid, term, qvec) rows; fused top-k lands under
    * `outDir/epoch=<id>` (read the root as parquet for an `epoch`
    * partition column). `keepEpochs` > 0 bounds the output dir: only
    * the latest that-many epoch dirs are retained (pruned from inside
    * the sink, idempotently — the vacuum-cadence discipline); 0 keeps
    * everything. */
  def serveStream(queries: DataFrame, bm25Dir: String, ivfDir: String,
      kLeg: Int, k: Int, nprobe: Int, outDir: String,
      checkpoint: String,
      keepEpochs: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(serveSink(bm25Dir, ivfDir, kLeg, k, nprobe, outDir,
        keepEpochs))
      .start()
}
