package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The THIRD committed standing-index lifecycle: the minhash/LSH
  * signature index behind cross-corpus near-dup gating, promoted from
  * a caller-persisted frame ([[Dedup.minhashDocIndex]] +
  * [[Dedup.minhashIndexAdmit]], the t29/t49 deployment split) to the
  * same crash-atomic, exactly-once, versioned-manifest lifecycle the
  * BM25 term-bucket index and the IVF cell index run
  * ([[ManifestIO]]): BUILD writes signature rows under a committed
  * manifest, ADMIT gates an arriving batch and appends only the
  * non-duplicates as one committed tick, GATE serves probe batches
  * from the committed rows, DELETE takes documents back out
  * bucket-locally, VACUUM retires superseded history — all with one
  * atomic CURRENT rename per tick and the per-app txn LEDGER for
  * streaming maintenance.
  *
  * Layout under the index dir:
  *   data/<v>/rows/bucket=<b>/…   signature rows (sid, gs, bhs) written
  *                                by tick v, partitioned by
  *                                bucket = pmod(xxhash64(sid), buckets)
  *   manifest/v<v>.txt            version, buckets, minhash params
  *                                (n:bands:rowsPerBand — serve and
  *                                admit read the SIGNATURE SCHEME from
  *                                the index, so a caller cannot probe
  *                                with mismatched hashing), per-bucket
  *                                contributing-version lists
  *                                (ACCRETIVE, like IVF cells), txns
  *   CURRENT                      the committed version
  *
  * WHY sid-hash buckets when the GATE cannot prune on them (LSH band
  * buckets are a different key): the bucket is the DELETE tick's
  * rewrite unit. A takedown request carries document ids; sid→bucket
  * is a pure function, so — unlike [[Bm25.deleteByIds]]'s full-scan
  * locate — the minhash delete reads and rewrites ONLY the requests'
  * buckets (~1/B of the index per batch) with no scan at all. The
  * gate reads all signature rows column-pruned per probe batch, the
  * documented t29 cost model (signature rows are ~8·|shingles| bytes,
  * not text).
  */
object MinhashIndex {

  /** Committed index state: minhash params ride the manifest so every
    * reader/writer derives the signature scheme from the index. */
  final case class Manifest(version: Long, buckets: Int, n: Int,
      bands: Int, rowsPerBand: Int, bucketVersions: Map[Int, Seq[Long]],
      txns: Map[String, Long] = Map.empty)

  private def render(m: Manifest): String = {
    val bv = m.bucketVersions.toSeq.sortBy(_._1)
      .map { case (b, vs) => s"$b:${vs.mkString("|")}" }.mkString(",")
    s"version=${m.version}\nbuckets=${m.buckets}\n" +
      s"params=${m.n}:${m.bands}:${m.rowsPerBand}\n" +
      s"bucketVersions=$bv\n" + ManifestIO.renderTxns(m.txns)
  }

  private def parse(text: String): Manifest = {
    val kv = ManifestIO.parseKv(text)
    val Array(n, bands, rpb) = kv("params").split(":").map(_.toInt)
    val bv = kv("bucketVersions").split(",").filter(_.nonEmpty).map { e =>
      val Array(b, vs) = e.split(":")
      b.toInt -> vs.split("\\|").map(_.toLong).toSeq
    }.toMap
    Manifest(kv("version").toLong, kv("buckets").toInt, n, bands, rpb, bv,
      ManifestIO.parseTxns(kv))
  }

  /** The committed manifest — every reader's one CURRENT read. */
  def readManifest(spark: SparkSession, dir: String): Manifest =
    parse(ManifestIO.readCurrent(spark, dir, "minhash index")._2)

  private def bucketOf(buckets: Int) =
    pmod(xxhash64(col("sid")), lit(buckets)).cast("int").as("bucket")

  /** The committed signature rows (sid, gs, bhs, bucket), each wanted
    * bucket read from the explicit data-version paths its manifest
    * entry lists; with `onlyBuckets` the others are never listed (the
    * delete tick's partition pruning, made literal). */
  def readRowsAt(spark: SparkSession, dir: String, m: Manifest,
      onlyBuckets: Option[Set[Int]] = None): DataFrame = {
    val wanted = onlyBuckets match {
      case Some(bs) => m.bucketVersions.filter { case (b, _) => bs(b) }
      case None => m.bucketVersions
    }
    ManifestIO.readVersionedArtifact(spark, dir, "rows", "bucket",
      "sid BIGINT, gs ARRAY<BIGINT>, bhs ARRAY<BIGINT>, bucket INT",
      wanted.toSeq.flatMap { case (b, vs) => vs.map(v => (v, b)) })
  }

  /** [[readRowsAt]] against a fresh CURRENT read. */
  def readRows(spark: SparkSession, dir: String,
      onlyBuckets: Option[Set[Int]] = None): DataFrame =
    readRowsAt(spark, dir, readManifest(spark, dir), onlyBuckets)

  /** BUILD (or offline rebuild): compute the corpus's signature rows
    * once ([[Dedup.minhashDocIndex]] — docs with < n tokens have no
    * shingle set, hence no row, the family's totality convention),
    * write them sid-bucket-partitioned under a fresh data version,
    * commit with one CURRENT rename. A rebuild over a committed index
    * allocates committed+1 and carries the txn ledger forward, like
    * its two siblings. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      n: Int, bands: Int, rowsPerBand: Int,
      buckets: Int = Bm25.IndexBuckets): Unit = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val spark = docs.sparkSession
    val (ver, priorTxns) = ManifestIO.buildSlot(spark, dir)
    ManifestIO.guardSlot(spark, dir, ver)
    Dedup.minhashDocIndex(docs, idCol, textCol, n, bands, rowsPerBand)
      .select(col("sid"), col("gs"), col("bhs"), bucketOf(buckets))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/data/$ver/rows")
    val present = ManifestIO.partitionIds(spark, s"$dir/data/$ver/rows", "bucket=")
      .map(_ -> Seq(ver)).toMap
    ManifestIO.commit(spark, dir, ver,
      render(Manifest(ver, buckets, n, bands, rowsPerBand, present, priorTxns)))
  }

  /** GATE (serve): which batch documents near-duplicate the committed
    * corpus — [[Dedup.minhashLshPairsAcrossIndexed]] against the
    * committed signature rows, one pinned manifest for the whole
    * probe. Emits (da = batch id, db = committed id, jaccard ≥
    * `threshold`); the signature scheme comes from the manifest. */
  def gate(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val m = readManifest(spark, dir)
    Dedup.minhashLshPairsAcrossIndexed(newDocs, readRowsAt(spark, dir, m),
      idCol, textCol, m.n, m.bands, m.rowsPerBand, threshold, maxBucket)
  }

  /** TIME-TRAVEL gate: [[gate]] against the index AS OF a committed
    * historical `version` ([[ManifestIO.readVersion]]'s servability
    * rules — "would this batch have deduplicated against last week's
    * corpus" is answerable as deep as the vacuum grace window). */
  def gateVersion(spark: SparkSession, dir: String, version: Long,
      newDocs: DataFrame, idCol: String, textCol: String, threshold: Double,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val m = readManifestVersion(spark, dir, version)
    Dedup.minhashLshPairsAcrossIndexed(newDocs, readRowsAt(spark, dir, m),
      idCol, textCol, m.n, m.bands, m.rowsPerBand, threshold, maxBucket)
  }

  /** The committed manifest AS OF a historical version (time travel). */
  def readManifestVersion(spark: SparkSession, dir: String,
      version: Long): Manifest =
    parse(ManifestIO.readVersion(spark, dir, version, "minhash index"))

  /** ADMISSION tick — the committed form of
    * [[Dedup.minhashIndexAdmit]]: gate the batch against the committed
    * rows, ADMIT every batch doc with no qualifying near-dup (and no
    * replayed sid — the same defense), and append the admitted docs'
    * signature rows as ONE committed tick (new data version accreting
    * onto the touched buckets' version lists + one CURRENT rename,
    * `txn`-capable for exactly-once streaming). Returns the per-doc
    * verdicts (sid, admitted, n_ref_matches) — computed and pinned
    * BEFORE the commit, so a caller routing admitted docs downstream
    * and the index always agree. The batch pays one tokenize+minhash
    * scan ([[Dedup.minhashDocIndex]], pinned); the committed side is a
    * column-pruned signature read. */
  final case class Admission(decisions: DataFrame, appended: Long)

  def admit(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxBucket: Int = Int.MaxValue): Admission =
    admitHooked(spark, dir, newDocs, idCol, textCol, threshold, maxBucket,
      crashPoint = 0)

  /** [[admit]] carrying a writer transaction (appId, epoch) — a
    * re-delivered epoch returns the no-op verdict frame (nothing
    * admitted twice); see [[ManifestIO.txnAlreadyApplied]]. */
  def admitTxn(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      appId: String, epoch: Long, maxBucket: Int = Int.MaxValue,
      onDecisions: DataFrame => Unit = _ => ()): Admission =
    admitHooked(spark, dir, newDocs, idCol, textCol, threshold, maxBucket,
      crashPoint = 0, txn = Some((appId, epoch)), onDecisions = onDecisions)

  /** [[admit]] with the standard injectable writer-death points
    * (1 = after the data write; 2 = after manifest, before flip). */
  private[graft] def admitHooked(spark: SparkSession, dir: String,
      newDocs: DataFrame, idCol: String, textCol: String, threshold: Double,
      maxBucket: Int, crashPoint: Int,
      txn: Option[(String, Long)] = None,
      onDecisions: DataFrame => Unit = _ => ()): Admission = {
    import spark.implicits._
    val m = readManifest(spark, dir)
    val emptyDecisions = Seq.empty[(Long, Boolean, Long)]
      .toDF("sid", "admitted", "n_ref_matches")
    if (ManifestIO.txnAlreadyApplied(m.txns, txn))
      return Admission(emptyDecisions, 0L) // retried epoch: already committed
    val newVer = m.version + 1
    // the uniform intra-batch rule first (ManifestIO.dedupBatch): a
    // doc re-submitted within one micro-batch gates and admits ONCE
    // (duplicate signature rows would emit duplicate band rows — and
    // duplicated pairs — on every later gate); two texts under one id
    // reject loudly. Then ONE tokenize+minhash scan of the batch,
    // pinned: the gate probe, the verdicts and the admitted-subset
    // write all see the same rows.
    val batchDocs = ManifestIO.dedupBatch(newDocs, idCol, Seq(textCol),
      "minhash admission")
    val batchIndex = Dedup.minhashDocIndex(batchDocs, idCol, textCol,
      m.n, m.bands, m.rowsPerBand).localCheckpoint(true)
    if (batchIndex.isEmpty) return Admission(emptyDecisions, 0L)
    val committed = readRowsAt(spark, dir, m)
    val gatePairs = Dedup.acrossPairs(
      Dedup.indexBandRows(batchIndex, m.bands, isNew = true)
        .unionAll(Dedup.indexBandRows(committed, m.bands, isNew = false)),
      threshold, maxBucket)
    val matches = gatePairs.groupBy(col("da").as("sid"))
      .agg(count(lit(1)).as("n_ref_matches"))
    // a replayed sid (already committed) pairs with nothing through the
    // same-id guard; its verdict must still be admitted=false or the
    // caller would double-ingest it — the minhashIndexAdmit defense,
    // kept verbatim on the committed rail
    val replayed = committed.select(col("sid")).distinct()
      .withColumn("replayed", lit(true))
    // decisions are batch-sized and consumed twice (returned + the
    // admitted-subset anti-join): pin them so verdicts and the written
    // rows cannot diverge
    val decisions = batchIndex.select(col("sid"))
      .join(matches, Seq("sid"), "left")
      .join(replayed, Seq("sid"), "left")
      .select(col("sid"),
        (col("n_ref_matches").isNull && col("replayed").isNull).as("admitted"),
        coalesce(col("n_ref_matches"), lit(0L)).as("n_ref_matches"))
      .localCheckpoint(true)
    // the verdict sink runs BEFORE the commit: a writer dying between
    // the two re-delivers the epoch, recomputes the identical verdicts
    // against the unchanged committed state and rewrites them — dying
    // after the commit leaves them already written; either way the
    // epoch's verdicts survive (the streaming sink's exactly-once
    // pairing of decisions dir + txn ledger)
    onDecisions(decisions)
    // the gate counts the PINNED decisions (cheap scan of a batch-sized
    // checkpoint) so the batchIndex ⋈ decisions join below executes
    // exactly once, at the write
    val appended = decisions.filter(col("admitted")).count()
    if (appended == 0L) return Admission(decisions, 0L) // nothing admitted: index already post-tick
    val admittedRows = batchIndex
      .join(decisions.filter(col("admitted")).select(col("sid")), Seq("sid"))
      .select(col("sid"), col("gs"), col("bhs"), bucketOf(m.buckets))
    ManifestIO.guardSlot(spark, dir, newVer)
    admittedRows.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/data/$newVer/rows")
    if (crashPoint == 1) return Admission(decisions, appended)
    val touched = ManifestIO.partitionIds(spark, s"$dir/data/$newVer/rows", "bucket=")
    val newBuckets = m.bucketVersions ++ touched.map(b =>
      b -> (m.bucketVersions.getOrElse(b, Seq.empty) :+ newVer))
    val body = render(Manifest(newVer, m.buckets, m.n, m.bands, m.rowsPerBand,
      newBuckets, ManifestIO.mergeTxn(m.txns, txn)))
    if (crashPoint == 2) {
      ManifestIO.writeManifestOnly(spark, dir, newVer, body)
      return Admission(decisions, appended)
    }
    ManifestIO.commit(spark, dir, newVer, body)
    Admission(decisions, appended)
  }

  /** DELETE tick — id-only takedown with NO scan at all: sid→bucket is
    * a pure function (pmod(xxhash64(sid), buckets)), so only the
    * requests' buckets are read, anti-joined and consolidated into the
    * new version (~1/B of the index per batch — better locality than
    * either sibling's id-only path). Ids never ingested match nothing;
    * a bucket emptied by the delete leaves the manifest; superseded
    * version history is the next vacuum's food. CRASH-ATOMIC +
    * exactly-once like every tick. */
  def deleteByIds(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    deleteByIdsHooked(spark, dir, ids, crashPoint = 0)

  /** [[deleteByIds]] carrying a writer transaction. */
  def deleteByIdsTxn(spark: SparkSession, dir: String, ids: DataFrame,
      appId: String, epoch: Long): Unit =
    deleteByIdsHooked(spark, dir, ids, crashPoint = 0,
      txn = Some((appId, epoch)))

  /** [[deleteByIds]] with the standard injectable writer-death points. */
  private[graft] def deleteByIdsHooked(spark: SparkSession, dir: String,
      ids: DataFrame, crashPoint: Int,
      txn: Option[(String, Long)] = None): Unit = {
    val m = readManifest(spark, dir)
    if (ManifestIO.txnAlreadyApplied(m.txns, txn)) return // retried epoch: already committed
    val newVer = m.version + 1
    val delIds = ids.select(col("sid").cast("long").as("sid"))
      .distinct().localCheckpoint(true)
    if (delIds.isEmpty) return
    // the requests' buckets by the pure sid→bucket function — no scan
    // participates in locating the CANDIDATE buckets; one read of just
    // those buckets then confirms which actually hold a matching row,
    // so ids never ingested (or already deleted) commit nothing — the
    // re-delete-proof contract, at candidate-buckets cost (~1/B)
    val candidates = delIds.select(bucketOf(m.buckets))
      .distinct().collect().map(_.getInt(0)) // ≤ bucket count values
      .filter(m.bucketVersions.contains)
    if (candidates.isEmpty) return // no materialized bucket can hold these ids
    val touched = readRowsAt(spark, dir, m, Some(candidates.toSet))
      .join(delIds, Seq("sid"), "left_semi")
      .select(col("bucket")).distinct()
      .collect().map(_.getInt(0)) // ≤ candidate count values
    if (touched.isEmpty) return // no id matched: the index already is the post-tick state
    ManifestIO.guardSlot(spark, dir, newVer)
    readRowsAt(spark, dir, m, Some(touched.toSet))
      .join(delIds, Seq("sid"), "left_anti")
      .select(col("sid"), col("gs"), col("bhs"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/data/$newVer/rows")
    if (crashPoint == 1) return
    val present =
      ManifestIO.partitionIds(spark, s"$dir/data/$newVer/rows", "bucket=").toSet
    val newBuckets = (m.bucketVersions -- touched) ++ present.map(_ -> Seq(newVer))
    val body = render(Manifest(newVer, m.buckets, m.n, m.bands, m.rowsPerBand,
      newBuckets, ManifestIO.mergeTxn(m.txns, txn)))
    if (crashPoint == 2) {
      ManifestIO.writeManifestOnly(spark, dir, newVer, body)
      return
    }
    ManifestIO.commit(spark, dir, newVer, body)
  }

  /** UPSERT tick — the REFRESH verb (the [[Bm25.upsertIndex]]
    * sibling): `docs` carries (id, text) rows whose NEW signature rows
    * REPLACE any committed rows of the same sid, and sids the index
    * has never seen plain-append — one crash-atomic commit, bypassing
    * the admission gate (a refresh is a correction, not a candidate).
    * sid→bucket is a pure function, so both the old rows and the new
    * rows of an id live in the SAME buckets: the tick reads ≤ |ids|
    * bucket dirs and rewrites each once with
    * (existing − batch sids) ∪ new rows. A doc whose new text is too
    * short to shingle (< n tokens) gets NO new row — its old rows
    * still leave, the family's totality convention. Batch deduplicated
    * by id (set semantics). */
  def upsert(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String): Unit =
    upsertHooked(spark, dir, docs, idCol, textCol, crashPoint = 0)

  /** [[upsert]] carrying a writer transaction. */
  def upsertTxn(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, appId: String, epoch: Long): Unit =
    upsertHooked(spark, dir, docs, idCol, textCol, crashPoint = 0,
      txn = Some((appId, epoch)))

  /** CHANGE-APPLY tick — the CDC verb (the [[Bm25.applyChanges]]
    * sibling): ONE mixed micro-batch of upserts and deletes folds into
    * the committed signature index in ONE crash-atomic commit.
    * `changes` carries (opCol, idCol, textCol) rows, op `'upsert'`
    * ([[upsert]] semantics) or `'delete'` (the [[deleteByIds]]
    * semantics — text ignored). An id carrying both ops in one batch
    * is rejected. */
  def applyChanges(spark: SparkSession, dir: String, changes: DataFrame,
      opCol: String, idCol: String, textCol: String): Unit =
    applyChangesHooked(spark, dir, changes, opCol, idCol, textCol,
      crashPoint = 0)

  /** [[applyChanges]] carrying a writer transaction. */
  def applyChangesTxn(spark: SparkSession, dir: String, changes: DataFrame,
      opCol: String, idCol: String, textCol: String,
      appId: String, epoch: Long): Unit =
    applyChangesHooked(spark, dir, changes, opCol, idCol, textCol,
      crashPoint = 0, txn = Some((appId, epoch)))

  /** [[applyChanges]] with the standard injectable writer-death
    * points. */
  private[graft] def applyChangesHooked(spark: SparkSession, dir: String,
      changes: DataFrame, opCol: String, idCol: String, textCol: String,
      crashPoint: Int, txn: Option[(String, Long)] = None): Unit = {
    val (ups, dels) =
      ManifestIO.splitChanges(changes, opCol, idCol, Seq(textCol))
    upsertCore(spark, dir, ups, dels.select(col(idCol).as("sid")),
      idCol, textCol, crashPoint, txn)
  }

  /** [[upsert]] with the standard injectable writer-death points. */
  private[graft] def upsertHooked(spark: SparkSession, dir: String,
      docs: DataFrame, idCol: String, textCol: String, crashPoint: Int,
      txn: Option[(String, Long)] = None): Unit = {
    // the uniform intra-batch rule (ManifestIO.dedupBatch): exact
    // duplicates collapse, two revisions of one id reject loudly
    val pinned = ManifestIO.dedupBatch(docs, idCol, Seq(textCol),
      "minhash upsert")
    upsertCore(spark, dir, pinned,
      pinned.select(col(idCol).cast("long").as("sid")).limit(0),
      idCol, textCol, crashPoint, txn)
  }

  /** The shared replace-or-insert core: `pinned` (id, text) upserts,
    * `extraDeleteSids` pure removals folded into the same commit —
    * empty for a plain [[upsert]]. `pinned` must already be pinned and
    * id-distinct. */
  private def upsertCore(spark: SparkSession, dir: String,
      pinned: DataFrame, extraDeleteSids: DataFrame,
      idCol: String, textCol: String, crashPoint: Int,
      txn: Option[(String, Long)]): Unit = {
    val m = readManifest(spark, dir)
    if (ManifestIO.txnAlreadyApplied(m.txns, txn)) return // retried epoch: already committed
    val newVer = m.version + 1
    val upSids = pinned.select(col(idCol).cast("long").as("sid"))
      .unionByName(extraDeleteSids.select(col("sid")))
      .distinct().localCheckpoint(true)
    if (upSids.isEmpty) return // empty batch: the index already is the post-tick state
    val newRows = Dedup.minhashDocIndex(pinned, idCol, textCol,
        m.n, m.bands, m.rowsPerBand)
      .select(col("sid"), col("gs"), col("bhs"), bucketOf(m.buckets))
      .localCheckpoint(true)
    // candidate buckets: a pure function of the batch's ids (the new
    // rows' sids are a subset of the batch's, so their buckets are too)
    val candB = upSids.select(bucketOf(m.buckets))
      .distinct().collect().map(_.getInt(0)) // ≤ bucket count values
    val candOld = candB.filter(m.bucketVersions.contains).toSet
    ManifestIO.guardSlot(spark, dir, newVer)
    readRowsAt(spark, dir, m, Some(candOld))
      .join(upSids, Seq("sid"), "left_anti")
      .select(col("sid"), col("gs"), col("bhs"), col("bucket"))
      .unionByName(newRows)
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/data/$newVer/rows")
    if (crashPoint == 1) return // simulated death: data written, nothing committed
    val present = ManifestIO
      .partitionIds(spark, s"$dir/data/$newVer/rows", "bucket=").toSet
    val newBuckets = (m.bucketVersions -- candOld) ++ present.map(_ -> Seq(newVer))
    val body = render(Manifest(newVer, m.buckets, m.n, m.bands, m.rowsPerBand,
      newBuckets, ManifestIO.mergeTxn(m.txns, txn)))
    if (crashPoint == 2) {
      ManifestIO.writeManifestOnly(spark, dir, newVer, body)
      return
    }
    ManifestIO.commit(spark, dir, newVer, body)
  }

  /** COMPACT tick — the [[graft.operators.Ann.ivfIndexCompact]]
    * sibling: admissions ACCRETE, so a signature bucket fed by N ticks
    * reads a union of N file groups at every gate and its manifest
    * entry grows without bound. Rewrite every bucket with
    * ≥ `minVersions` distinct contributing versions into ONE new data
    * version (a pure physical rewrite — rows bit-identical), collapse
    * the manifest entries, leave unpicked buckets unlisted; the
    * superseded history is the next vacuum's food. Crash-atomic, txn
    * ledger carried forward, single-writer maintenance. Returns the
    * compacted bucket ids. */
  def compact(spark: SparkSession, dir: String, minVersions: Int = 2): Seq[Int] =
    compactHooked(spark, dir, minVersions, crashPoint = 0)

  /** [[compact]] with the standard injectable writer-death points. */
  private[graft] def compactHooked(spark: SparkSession, dir: String,
      minVersions: Int, crashPoint: Int): Seq[Int] = {
    require(minVersions >= 2,
      s"minVersions < 2 would rewrite single-version buckets for nothing: $minVersions")
    val m = readManifest(spark, dir)
    val picked = m.bucketVersions
      .filter { case (_, vs) => vs.distinct.size >= minVersions }
      .keys.toSeq.sorted
    if (picked.isEmpty) return Seq.empty // nothing fragmented: no tick
    val newVer = m.version + 1
    ManifestIO.guardSlot(spark, dir, newVer)
    // one exchange on the bucket id → one file per bucket (the
    // ivfIndexCompact rationale: the rewrite must not inherit the
    // read's per-task fan-out)
    readRowsAt(spark, dir, m, Some(picked.toSet))
      .select(col("sid"), col("gs"), col("bhs"), col("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/data/$newVer/rows")
    if (crashPoint == 1) return Seq.empty // simulated death: data written, nothing committed
    val present = ManifestIO
      .partitionIds(spark, s"$dir/data/$newVer/rows", "bucket=").toSet
    val newBuckets = (m.bucketVersions -- picked) ++ present.map(_ -> Seq(newVer))
    val body = render(Manifest(newVer, m.buckets, m.n, m.bands, m.rowsPerBand,
      newBuckets, ManifestIO.mergeTxn(m.txns, None)))
    if (crashPoint == 2) {
      ManifestIO.writeManifestOnly(spark, dir, newVer, body)
      return Seq.empty
    }
    ManifestIO.commit(spark, dir, newVer, body)
    picked
  }

  /** VACUUM tick: retire data versions and manifests the committed
    * manifest no longer references ([[ManifestIO.vacuum]] semantics —
    * single-writer maintenance, grace counted in versions). Admissions
    * accrete (nothing superseded until a delete consolidates or a
    * rebuild replaces); deletes and rebuilds feed this. */
  def vacuum(spark: SparkSession, dir: String,
      graceVersions: Long = 2L, graceMillis: Long = 0L): Seq[Long] = {
    val m = readManifest(spark, dir)
    // in-window manifests are still servable (pinned readers, the
    // time-travel gate): their references survive too — the
    // Bm25.vacuumIndex rationale; sharpest after a compaction re-owned
    // every fragmented bucket in one commit
    val all = m +: ManifestIO.windowManifests(spark, dir, m.version,
      graceVersions, graceMillis).map(parse)
    ManifestIO.vacuum(spark, dir, m.version,
      all.flatMap(_.bucketVersions.values.flatten).toSet + m.version,
      graceVersions, graceMillis)
  }
}
