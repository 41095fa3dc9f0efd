package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media quality gates — the LAION/DataComp-style filtering leg of the
  * multimodal pipeline (the [[Quality]]/Gopher discipline applied to
  * images): a crawled image corpus is dominated by tracking pixels,
  * tiny thumbnails, solid-color placeholders and banner-shaped ads, and
  * the standard curation step drops them by cheap integer rules BEFORE
  * any expensive downstream work (perceptual dedup, embedding).
  *
  * Rules (all integer-exact, so a closed-form oracle can replay them):
  *   - `small`: width or height below the minimum (tracking pixels,
  *     favicon-class thumbnails);
  *   - `uniform`: max-min luma spread below the minimum (solid
  *     placeholders, blank fills — BT.601 integer luma, the
  *     [[VideoDedup]] weights);
  *   - `aspect`: max(w,h) > maxAspect * min(w,h) (banner ads);
  *   - `undecodable`: bytes no decoder accepts (always rejected — a
  *     GATE must verdict every row, unlike the signature kernels'
  *     emit-nothing totality).
  *
  * Scale shape: ONE narrow decode pass per image emitting a fixed-width
  * stats row; the gates are codegen'd column arithmetic over it. Bytes
  * never shuffle; no exchange at all unless the caller aggregates. */
object MediaQuality {

  /** Integer per-image stats in one decode pass: (media_id, width,
    * height, luma_min, luma_max); undecodable/null-byte rows emit
    * width -1 (the gate turns that into the `undecodable` verdict). */
  def imageStats(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val img = if (bytes == null) None
          else graft.multimodal.Multimodal.JvmImageCodec.decodeImage(bytes)
        img match {
          case None => (id, -1, -1, -1, -1)
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
            (id, im.getWidth, im.getHeight, mn, mx)
        }
      }
      .toDF("media_id", "width", "height", "luma_min", "luma_max")
  }

  /** Integer per-clip stats in one decode pass: (media_id, n_samples,
    * n_silent, n_clipped) over s16 mono PCM — `n_silent` counts
    * |sample| < silenceAbs, `n_clipped` counts |sample| >= clipAbs.
    * Undecodable/null-byte rows emit n_samples -1. */
  def audioStats(media: DataFrame, idCol: String, bytesCol: String,
      silenceAbs: Int, clipAbs: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val pcm = if (bytes == null) None
          else graft.multimodal.Multimodal.JvmAudioCodec.decode(bytes).map(_._2)
        pcm match {
          case None => (id, -1L, -1L, -1L)
          case Some(p) =>
            val n = p.length / 2
            var sil = 0L; var clip = 0L
            var i = 0
            while (i < n) {
              val s = ((p(2 * i) & 0xff) | (p(2 * i + 1) << 8)).toShort
              val a = math.abs(s.toInt)
              if (a < silenceAbs) sil += 1
              if (a >= clipAbs) clip += 1
              i += 1
            }
            (id, n.toLong, sil, clip)
        }
      }
      .toDF("media_id", "n_samples", "n_silent", "n_clipped")
  }

  /** Per-clip gate verdicts — the speech-corpus curation rules:
    * `short` (fewer than minSamples), `silent` (integer silence percent
    * above maxSilencePct), `clipped` (integer clip percent above
    * maxClipPct), `undecodable`. Output: (media_id, n_samples,
    * silence_pct, clip_pct, keep, reasons) with reasons the
    * comma-joined alphabetical subset of failing rules. */
  def audioGates(media: DataFrame, idCol: String, bytesCol: String,
      minSamples: Int, silenceAbs: Int, maxSilencePct: Int,
      clipAbs: Int, maxClipPct: Int): DataFrame = {
    require(minSamples > 0 && silenceAbs > 0 && clipAbs > 0
      && maxSilencePct >= 0 && maxClipPct >= 0, "gate thresholds must be positive")
    val stats = audioStats(media, idCol, bytesCol, silenceAbs, clipAbs)
    val undecodable = col("n_samples") < 0
    // floor division (Spark `/` on longs is DOUBLE division; counts are
    // far below 2^53 so the floor is exact and matches DuckDB's `//`)
    val silPct = when(col("n_samples") > 0,
      floor(col("n_silent") * 100L / col("n_samples"))).otherwise(lit(0L)).cast("long")
    val clipPct = when(col("n_samples") > 0,
      floor(col("n_clipped") * 100L / col("n_samples"))).otherwise(lit(0L)).cast("long")
    val short = !undecodable && col("n_samples") < minSamples
    val silent = !undecodable && silPct > maxSilencePct
    val clipped = !undecodable && clipPct > maxClipPct
    stats.select(
      col("media_id"), col("n_samples"),
      when(undecodable, lit(-1L)).otherwise(silPct).as("silence_pct"),
      when(undecodable, lit(-1L)).otherwise(clipPct).as("clip_pct"),
      (!undecodable && !short && !silent && !clipped).as("keep"),
      concat_ws(",",
        when(clipped, lit("clipped")),
        when(short, lit("short")),
        when(silent, lit("silent")),
        when(undecodable, lit("undecodable"))).as("reasons"))
  }

  /** Integer per-clip VIDEO stats in one container-decode pass:
    * (media_id, n_frames, width, height, luma_spread) — spread is the
    * max-min of per-frame integer mean luma ([[VideoDedup.meanLuma]]),
    * the still-image-as-video detector. MJPEG-in-AVI first, animated
    * GIF fallback; undecodable rows emit n_frames -1. */
  def videoStats(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val frames = if (bytes == null) None
          else graft.multimodal.Multimodal.JvmAviCodec.decodeMjpegAvi(bytes).map(_._2)
            .orElse(graft.multimodal.Multimodal.JvmGifCodec.decodeFrames(bytes))
            .orElse(graft.multimodal.Multimodal.JvmY4mCodec.decodeY4m(bytes).map(_._2))
        frames match {
          case None => (id, -1L, -1, -1, -1L)
          case Some(fs) if fs.isEmpty => (id, 0L, -1, -1, 0L)
          case Some(fs) =>
            val lumas = fs.map(VideoDedup.meanLuma)
            (id, fs.length.toLong, fs.head.getWidth, fs.head.getHeight,
              lumas.max - lumas.min)
        }
      }
      .toDF("media_id", "n_frames", "width", "height", "luma_spread")
  }

  /** Per-clip VIDEO gate verdicts — `short` (fewer than minFrames),
    * `small` (frame dims below minimums), `static` (temporal mean-luma
    * spread below the minimum: a still image shipped as video),
    * `undecodable`. Output: (media_id, n_frames, width, height,
    * luma_spread, keep, reasons), reasons the comma-joined alphabetical
    * subset of failing rules. */
  def videoGates(media: DataFrame, idCol: String, bytesCol: String,
      minFrames: Int, minW: Int, minH: Int, minSpread: Int): DataFrame = {
    require(minFrames > 0 && minW > 0 && minH > 0 && minSpread >= 0,
      "gate thresholds must be positive")
    val stats = videoStats(media, idCol, bytesCol)
    val undecodable = col("n_frames") < 0
    val short = !undecodable && col("n_frames") < minFrames
    val small = !undecodable && (col("width") < minW || col("height") < minH)
    val static0 = !undecodable && col("luma_spread") < minSpread
    stats.select(
      col("media_id"), col("n_frames"), col("width"), col("height"),
      col("luma_spread"),
      (!undecodable && !short && !small && !static0).as("keep"),
      concat_ws(",",
        when(short, lit("short")),
        when(small, lit("small")),
        when(static0, lit("static")),
        when(undecodable, lit("undecodable"))).as("reasons"))
  }

  /** Per-image gate verdicts: (media_id, width, height, luma_spread,
    * keep, reasons). `reasons` is the comma-joined ordered subset of
    * failing rules (aspect,small,undecodable,uniform — alphabetical so
    * both engines agree), empty string when kept. */
  def imageGates(media: DataFrame, idCol: String, bytesCol: String,
      minW: Int, minH: Int, minSpread: Int, maxAspect: Int): DataFrame = {
    require(minW > 0 && minH > 0 && minSpread >= 0 && maxAspect >= 1,
      "gate thresholds must be positive")
    val stats = imageStats(media, idCol, bytesCol)
    val undecodable = col("width") < 0
    val small = !undecodable && (col("width") < minW || col("height") < minH)
    val uniform = !undecodable && (col("luma_max") - col("luma_min")) < minSpread
    val aspect = !undecodable &&
      greatest(col("width"), col("height")) >
        lit(maxAspect) * least(col("width"), col("height"))
    stats.select(
      col("media_id"), col("width"), col("height"),
      when(undecodable, lit(-1))
        .otherwise(col("luma_max") - col("luma_min")).as("luma_spread"),
      (!undecodable && !small && !uniform && !aspect).as("keep"),
      concat_ws(",",
        when(aspect, lit("aspect")),
        when(small, lit("small")),
        when(undecodable, lit("undecodable")),
        when(uniform, lit("uniform"))).as("reasons"))
  }
}
