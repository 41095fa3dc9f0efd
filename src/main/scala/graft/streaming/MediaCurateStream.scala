package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MediaCurate

/** Streaming media curation front — the [[CurateStream]] shape on the
  * media side: the STATELESS prefix (one decode per arrival → quality
  * gates, code SHARED with the batch chain via
  * [[MediaCurate.statsSigOf]]/[[MediaCurate.gatedCol]], so stream and
  * batch agree on every verdict by construction) composed with
  * watermark-bounded EXACT content dedup (first arrival of each md5
  * wins within the horizon — [[DedupStream.withinWatermark]]'s policy
  * on the bytes column; only the 128-bit hash enters state).
  *
  * Output rows carry the survivor's 64-bit dHash, ready for the
  * perceptual stage ([[MediaNearDupStream.sigPairs]]) — two stateful
  * operators keyed differently (md5 vs pigeonhole chunk) belong in two
  * queries, the standard staged layout. Global exact dedup over ALL
  * history is the batch compaction's job, as everywhere else. */
object MediaCurateStream {

  /** Stateless per-arrival scan: (media_id, chash, w, h, spread,
    * dhash, <eventTimeCol>). Every row decodes (a stream has no
    * cross-row scan to dedup against; the md5 state does that next). */
  def scanned(media: DataFrame, idCol: String, bytesCol: String,
      eventTimeCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.selectExpr(s"CAST($idCol AS LONG) AS mid", s"$bytesCol AS bytes",
        s"$eventTimeCol AS ets")
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.flatMap { case (mid, bytes, ets) =>
          if (bytes == null) None
          else {
            val ch = md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
            val (w, h, spread, dhash) = MediaCurate.statsSigOf(bytes)
            Some((mid, ch, w, h, spread, dhash, ets))
          }
        }
      }
      .toDF("media_id", "chash", "w", "h", "spread", "dhash", eventTimeCol)
  }

  /** Gate + watermark-bounded exact dedup: survivors as (media_id,
    * dhash, <eventTimeCol>) — the perceptual stage's input. */
  def gateExactWithinWatermark(media: DataFrame, idCol: String, bytesCol: String,
      eventTimeCol: String, delay: String,
      minW: Int, minH: Int, minSpread: Int, maxAspect: Int): DataFrame =
    scanned(media, idCol, bytesCol, eventTimeCol)
      .filter(!MediaCurate.gatedCol(minW, minH, minSpread, maxAspect))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("chash")
      .select(col("media_id"), col("dhash"), col(eventTimeCol))
}
