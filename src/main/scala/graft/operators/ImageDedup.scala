package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the multimodal analog of
  * the text near-dup family (the LAION-style dedup step): every image
  * reduces to a 64-bit dHash
  * ([[graft.multimodal.Multimodal.JvmImageCodec.dHash]]) inside the
  * decode task, and near-duplicates are pairs within a small Hamming
  * radius, found by the pigeonhole rule (a pair within distance d
  * agrees exactly on at least one of d+1 bit-chunks) — the same
  * bucketed kernel discipline as [[Dedup.simhashSigPairs]], widened to
  * the full 64-bit signature.
  *
  * Scale: image bytes never shuffle — one narrow decode pass emits
  * (id, hash) rows; the pair search buckets by chunk value, compares
  * full hashes in-bucket only, and emits each pair once via the
  * canonical-chunk rule (no output distinct exchange). */
object ImageDedup extends Serializable {

  /** One narrow decode pass: (img_id, dhash). Undecodable or null
    * blobs emit nothing (decoder-totality convention). */
  def dhashSignatures(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.multimodal.Multimodal.JvmImageCodec.decodeImage(bytes)
          .map(img => (id, graft.multimodal.Multimodal.JvmImageCodec.dHash(img)))
      }
      .toDF("img_id", "dhash")
  }

  /** All (da < db) pairs within `maxDist` Hamming distance over 64-bit
    * signatures: chunk the hash into maxDist+1 bit-ranges (widths as
    * even as 64 allows), bucket-join on each chunk value, verify with
    * one popcount, emit once at the first agreeing chunk.
    *
    * Skew discipline (the [[Dedup.simhashSigPairs]] t9 shape): the
    * pigeonhole buckets hold DISTINCT signatures only, so in-bucket
    * quadratic work is bounded by signature diversity, never by corpus
    * size — the single most common crawl-scale case, millions of
    * byte-identical images (blank thumbnails, logos, tracking pixels)
    * sharing one dHash, contributes ONE row to the kernel. Member id
    * pairs come back via equi-joins on the signature (distributed join
    * output, not one task's nested loop); same-signature families emit
    * their Hamming-0 member pairs from a streamed group iterator whose
    * memory is O(family ids), never O(pairs). `maxBucket` (default
    * uncapped; the oracle queries run uncapped) additionally skips —
    * and counts in [[Dedup.SkippedBucketsAcc]] — any pigeonhole bucket
    * of distinct signatures, and any single-signature family, larger
    * than the cap: the pairs a family cap drops are exact-duplicate
    * near-dups, exactly what a content-hash exact-dedup lane (run
    * first — see [[MediaDedup]]) collapses more cheaply.
    *
    * The (sig, id) table is localCheckpoint-pinned because it is
    * consumed three times (distinct kernel, family lane, member-join
    * back) and recomputing it would re-run the upstream media decode
    * pass per consumer — the [[Dedup.simhashNearStats]] discipline. */
  /** Pigeonhole chunk boundaries: maxDist+1 bit-ranges covering the
    * 64-bit signature, widths as even as 64 allows. Shared by the batch
    * kernel and [[graft.streaming.MediaNearDupStream]] so batch and
    * stream agree on bucketing by construction. */
  private[graft] def chunkBoundsFor(maxDist: Int): Array[Int] = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist must be in [0, 64), got $maxDist")
    (0 to maxDist + 1).map(c => c * 64 / (maxDist + 1)).toArray
  }

  private[graft] def chunkValAt(sig: Long, c: Int, bounds: Array[Int]): Long = {
    val width = bounds(c + 1) - bounds(c)
    if (width >= 64) sig
    else (sig >>> bounds(c)) & ((1L << width) - 1)
  }

  /** First chunk index two signatures agree on — the canonical chunk
    * owning a pair's single emission (callers only reach it for pairs
    * meeting in SOME bucket, so a match exists). */
  private[graft] def firstSharedChunkOf(a: Long, b: Long, bounds: Array[Int]): Int = {
    var k = 0
    while (chunkValAt(a, k, bounds) != chunkValAt(b, k, bounds)) k += 1
    k
  }

  def nearPairs(sigs: DataFrame, maxDist: Int,
      idCol: String = "img_id", sigCol: String = "dhash",
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val skipped = skippedAcc.getOrElse(
      spark.sparkContext.longAccumulator(Dedup.SkippedBucketsAcc))
    val chunks = maxDist + 1
    val bounds = chunkBoundsFor(maxDist)
    def chunkVal(sig: Long, c: Int): Long = chunkValAt(sig, c, bounds)
    val members = sigs.select(col(sigCol).cast("long").as("sig"),
      col(idCol).cast("long").as("id")).localCheckpoint()
    // distinct-signature pigeonhole: (sa < sb by signature value, ham >= 1)
    val sigPairs = members.select(col("sig")).distinct().as[Long]
      .flatMap(sig => (0 until chunks).map(c => (c, chunkVal(sig, c), sig)))
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, it) =>
        val c = key._1
        val capped = Dedup.cappedBucket(it.map(_._3), maxBucket, skipped)
        if (capped == null) Iterator.empty
        else {
          val ss = capped.sorted
          def firstSharedChunk(a: Long, b: Long): Int = firstSharedChunkOf(a, b, bounds)
          val out = Iterator.newBuilder[(Long, Long, Long)]
          var i = 0
          while (i < ss.length) {
            var j = i + 1
            while (j < ss.length) {
              val ham = java.lang.Long.bitCount(ss(i) ^ ss(j))
              if (ham <= maxDist && firstSharedChunk(ss(i), ss(j)) == c)
                out += ((ss(i), ss(j), ham.toLong))
              j += 1
            }
            i += 1
          }
          out.result()
        }
      }
      .toDF("sa", "sb", "hamming")
    // cross-signature member pairs: two equi-joins fan the distinct-sig
    // pairs back out to ids — the quadratic family product is join
    // output, produced streaming, never a buffered in-task array
    val cross = sigPairs
      .join(members.select(col("sig").as("sa"), col("id").as("ia")), "sa")
      .join(members.select(col("sig").as("sb"), col("id").as("ib")), "sb")
      .filter(col("ia") =!= col("ib"))
      .select(least(col("ia"), col("ib")).as("da"),
        greatest(col("ia"), col("ib")).as("db"), col("hamming"))
    // same-signature families: Hamming-0 pairs among the ids sharing
    // one signature, streamed from the sorted id array (O(k) memory)
    val sameSig = members.as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val capped = Dedup.cappedBucket(it.map(_._2), maxBucket, skipped)
        if (capped == null || capped.length < 2) Iterator.empty
        else {
          val ids = capped.sorted
          ids.indices.iterator.flatMap { i =>
            (i + 1 until ids.length).iterator
              .filter(j => ids(j) != ids(i))
              .map(j => (ids(i), ids(j), 0L))
          }
        }
      }
      .toDF("da", "db", "hamming")
    cross.unionAll(sameSig)
  }

  /** Media dup-cluster resolution — the t14 discipline on perceptual
    * signatures: pairwise near-dup verdicts don't partition a corpus
    * (a~b, b~c needs a transitive rule to pick ONE keeper for
    * {a,b,c}), so the pair relation is closed into connected
    * components over DISTINCT signature values. Byte-identical and
    * Hamming-0 images collapse into one NODE before any graph work —
    * the node count is bounded by distinct signatures, never by corpus
    * size, exactly like [[Dedup.simhashSigPairs]]'s kernel. Cluster id
    * = minimum reachable signature (an image with no near neighbor
    * clusters alone under its own signature); keeper = min media id in
    * the cluster. Returns (media_id, cluster, keeper_media_id).
    *
    * The component table is joined back broadcast: its row count is
    * the number of distinct signatures PARTICIPATING in near pairs —
    * the near-dup family count, which a corpus where it approaches
    * corpus size has bigger problems than this join (swap to a plain
    * equi-join there). */
  def clusters(sigs: DataFrame, maxDist: Int,
      idCol: String = "img_id", sigCol: String = "dhash",
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      maxDriverEdges: Int = Components.MaxDriverEdges): DataFrame = {
    val members = sigs.select(col(idCol).cast("long").as("id"),
      col(sigCol).cast("long").as("sig")).localCheckpoint()
    val nodes = members.select(col("sig")).distinct()
    val edges = nearPairs(
      nodes.select(col("sig").as(idCol), col("sig").as(sigCol)),
      maxDist, idCol, sigCol, maxBucket, skippedAcc)
      .select(col("da"), col("db"))
    val comp = Components.componentsAuto(edges, "da", "db", maxDriverEdges)
      .withColumnRenamed("node", "sig")
    val withCluster = members.join(broadcast(comp), Seq("sig"), "left")
      .select(col("id").as("media_id"),
        coalesce(col("component"), col("sig")).as("cluster"))
    val keepers = withCluster.groupBy(col("cluster"))
      .agg(min(col("media_id")).as("keeper_media_id"))
    withCluster.join(broadcast(keepers), "cluster")
      .select(col("media_id"), col("cluster"), col("keeper_media_id"))
  }
}
