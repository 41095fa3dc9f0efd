package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed MEDIA curation chain — the [[graft.queries.Text]]
  * t30 discipline applied to images: quality gates
  * ([[MediaQuality]] size / uniform-luma / aspect / undecodable) →
  * exact content dedup (md5 families, keeper = min id) → perceptual
  * near-dup (dHash + guarded pigeonhole, keep-first dominance), in ONE
  * dataflow with ONE decode pass.
  *
  * The fusion is what makes it scale: md5 every row, but decode only
  * the FIRST occurrence of each content per partition, computing the
  * quality stats AND the perceptual signature from that single decode
  * (byte-identical copies share both by definition). Everything after
  * the scan is hash/id-column arithmetic — media bytes never shuffle,
  * and a gated content (tracking pixel, placeholder) never reaches the
  * pair search at all, which is exactly the mega-family defense the
  * crawl needs (the blank-thumbnail family is usually ALSO the
  * uniform-luma family).
  *
  * Verdict per row: `gated` (its content fails a quality rule or is
  * undecodable; dup_of null), `exact_dup` (byte-identical to a
  * smaller-id row of a surviving content), `near_dup` (surviving
  * keeper with a smaller-keeper neighbor within `maxDist`), `keep`. */
object MediaCurate {

  private def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** One-decode stats+signature kernel SHARED by the batch chain and
    * [[graft.streaming.MediaCurateStream]] (so stream and batch agree
    * on gates and signatures by construction): (width, height,
    * luma_spread, dhash); (-1, -1, -1, 0) for undecodable bytes. */
  private[graft] def statsSigOf(bytes: Array[Byte]): (Int, Int, Int, Long) =
    graft.multimodal.Multimodal.JvmImageCodec.decodeImage(bytes) match {
      case None => (-1, -1, -1, 0L)
      case Some(im) =>
        var mn = 255; var mx = 0
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) {
            val rgb = im.getRGB(x, y)
            val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000
            if (l < mn) mn = l
            if (l > mx) mx = l
            x += 1
          }
          y += 1
        }
        (im.getWidth, im.getHeight, mx - mn,
          graft.multimodal.Multimodal.JvmImageCodec.dHash(im))
    }

  /** The gate predicate over (w, h, spread) stat columns — shared with
    * the streaming front so thresholds mean the same thing there. */
  private[graft] def gatedCol(minW: Int, minH: Int, minSpread: Int,
      maxAspect: Int): org.apache.spark.sql.Column =
    col("w") < 0 || col("w") < minW || col("h") < minH ||
      col("spread") < minSpread ||
      greatest(col("w"), col("h")) > lit(maxAspect) * least(col("w"), col("h"))

  def imageCurate(media: DataFrame, idCol: String, bytesCol: String,
      minW: Int, minH: Int, minSpread: Int, maxAspect: Int, maxDist: Int,
      maxBucket: Int = Int.MaxValue,
      skippedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    require(minW > 0 && minH > 0 && minSpread >= 0 && maxAspect >= 1,
      "gate thresholds must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val m = media.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .filter(col("id").isNotNull && col("bytes").isNotNull)
    // ONE decode per distinct content per partition: stats + signature
    // from the same BufferedImage; non-first rows carry only (id, md5)
    val scanned = m.as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        val seen = new java.util.HashSet[String]()
        rows.map { case (id, bytes) =>
          val ch = hex(md.digest(bytes))
          if (!seen.add(ch)) (id, ch, None: Option[(Int, Int, Int, Long)])
          else (id, ch, Some(statsSigOf(bytes)))
        }
      }
      .map { case (id, ch, st) =>
        (id, ch, st.map(_._1), st.map(_._2), st.map(_._3), st.map(_._4))
      }
      .toDF("id", "chash", "w", "h", "spread", "dhash")
      .localCheckpoint() // consumed twice; the blob scan must not re-run
    // per-content rollup: keeper + the (identical-across-copies) stats
    val content = scanned.groupBy("chash").agg(
      min("id").as("keeper"), max("w").as("w"), max("h").as("h"),
      max("spread").as("spread"), max("dhash").as("dhash"))
    val qual = content.select(col("chash"), col("keeper"),
      gatedCol(minW, minH, minSpread, maxAspect).as("gated"), col("dhash"))
    val keeperSigs = qual.filter(!col("gated")).select(col("keeper"), col("dhash"))
    val pairs = ImageDedup.nearPairs(keeperSigs, maxDist,
      idCol = "keeper", sigCol = "dhash", maxBucket = maxBucket,
      skippedAcc = skippedAcc)
    val nearOf = pairs.groupBy(col("db").as("id")).agg(min(col("da")).as("near_of"))
    scanned.select(col("id"), col("chash"))
      .join(qual, "chash")
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as("media_id"),
        when(col("gated"), lit("gated"))
          .when(col("id") =!= col("keeper"), lit("exact_dup"))
          .when(col("near_of").isNotNull, lit("near_dup"))
          .otherwise(lit("keep")).as("action"),
        when(col("gated"), lit(null).cast("long"))
          .when(col("id") =!= col("keeper"), col("keeper"))
          .otherwise(col("near_of")).as("dup_of"))
  }
}
