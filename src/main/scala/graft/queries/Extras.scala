package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Second wave of SURVEY §2 coverage: scalar pack (F13/F15/F16/F5 bit
  * ops), A3 first-per-group, unionByName (§2.7), multimodal binary
  * metadata.
  */
object Extras {

  /** F15 epoch split + F16 µs clamp + F5 bit masks/shifts over `events`. */
  val q15ScalarPack2: Q = Q(
    "q15_scalar_pack2",
    """SELECT event_id,
      |  epoch_us(ts) // 1000000 AS time_epoch,
      |  CAST(epoch_us(ts) % 1000000 AS BIGINT) AS useconds_epoch,
      |  event_id & 255 AS masked_low,
      |  CAST(event_id >> 4 AS BIGINT) AS shifted,
      |  replace(replace(replace(props, '&amp;', '&'), '&lt;', '<'), '&gt;', '>') AS unescaped
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        (unix_micros(col("ts")) / 1000000L).cast("long").as("time_epoch"),
        (unix_micros(col("ts")) % 1000000L).cast("long").as("useconds_epoch"),
        col("event_id").bitwiseAND(255).as("masked_low"),
        shiftright(col("event_id"), 4).cast("long").as("shifted"),
        regexp_replace(regexp_replace(regexp_replace(col("props"),
          "&amp;", "&"), "&lt;", "<"), "&gt;", ">").as("unescaped"))
      .orderBy(col("event_id"))
  }

  /** A3 first-per-group selection (`sip_ingestor.py:407-413`): the
    * representative row is the first by explicit (ts, id) order. */
  val q16FirstPerGroup: Q = Q(
    "q16_first_per_group",
    """SELECT user_id, event_id AS first_event_id, event_type AS first_event_type, ts AS first_ts
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("event_type").as("first_event_type"), col("ts").as("first_ts"))
      .orderBy(col("user_id"))
  }

  /** §2.7 union of linked + unlinked outputs
    * (`http_ss7_ingestor.py:589-599`): two projections merged by name. */
  val q17UnionByName: Q = Q(
    "q17_union_by_name",
    """SELECT * FROM (
      |  SELECT event_id, user_id, 'linked' AS link_state FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT event_id, user_id, 'unlinked' AS link_state FROM events WHERE event_type = 'error'
      |)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val linked = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), lit("linked").as("link_state"))
    val unlinked = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), lit("unlinked").as("link_state"))
    linked.unionByName(unlinked).orderBy(col("event_id"))
  }

  /** Multimodal binary-column metadata (blob length + content hash) —
    * the oracle-checkable slice of graft.multimodal (the codec itself is
    * stubbed; see Multimodal scaladoc). */
  val q18MediaMeta: Q = Q(
    "q18_media_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  'text' AS kind
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"),
        lit("text").as("kind"))
      .orderBy(col("doc_id"))
  }

  /** Native `session_window` (Spark's streaming-compatible session
    * operator, §2.10's analog of J7) — same 30-min gap as q6; window end
    * = last event + gap. Oracle derives the identical windows from the
    * lag/cumsum formulation. */
  val q19SessionWindow: Q = Q(
    "q19_session_window",
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM g
      |)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events
      |FROM numbered
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** P14 CIDR exclusion over synthesized dotted-quad addresses (pure bit
    * arithmetic — `operators/Cidr`). */
  val q20CidrFilter: Q = Q(
    "q20_cidr_filter",
    """SELECT event_id,
      |  '10.' || CAST(user_id % 256 AS BIGINT) || '.' || CAST(event_id % 256 AS BIGINT) || '.1' AS src_ip
      |FROM events
      |WHERE NOT (CAST(user_id % 256 AS BIGINT) = 5 AND (CAST(event_id % 256 AS BIGINT) >> 7) = 1)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val srcIp = concat(lit("10."), (col("user_id") % 256).cast("long").cast("string"),
      lit("."), (col("event_id") % 256).cast("long").cast("string"), lit(".1"))
    graft.Tables.events(s, d)
      .select(col("event_id"), srcIp.as("src_ip"))
      // exclude 10.5.128.0/17 → user_id%256 == 5 and third octet >= 128
      .filter(graft.operators.Cidr.excludeFilter(col("src_ip"), col("src_ip"), Seq("10.5.128.0/17")))
      .orderBy(col("event_id"))
  }

  /** Blob-scale multimodal pipeline (round-1 ask #10): synthesize a
    * 16-80 KiB binary blob per document (sizes deliberately skewed,
    * magic bytes cycling jpeg/png/raw), run the REAL media path —
    * [[graft.multimodal.Multimodal.repartitionBySize]] to cap
    * blob-bytes-per-task, `mapPartitions` decode (one codec init per
    * partition), resize, frame-sample — and emit the closed-form-checkable
    * outputs. At sf0.1 this pushes ~240 MB of blob bytes through the
    * shuffle + decode, so the BENCH row exercises the real shape; the
    * stub codec's derived fields (mime sniff, duration=len, resize cap,
    * every-4th-1KiB frame count) are exactly reproducible in SQL. */
  val m1MediaPipeline: Q = Q(
    "m1_media_pipeline",
    """WITH d AS (SELECT doc_id, 16384 + (doc_id % 5) * 16384 AS len FROM documents)
      |SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
      |       WHEN doc_id % 3 = 1 THEN 'image/png'
      |       ELSE 'application/octet-stream' END AS mime,
      |  len AS duration_ms,
      |  CAST(least(len, 32768) AS INTEGER) AS resized_len,
      |  CAST(len // 4096 AS INTEGER) AS n_frames
      |FROM d ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.{MediaRecord, Multimodal}
    val docs = Tables.documents(s, d)
    val nDocs = docs.count()
    // blob synthesis is ~24 MB of byte-filling: keep it off the
    // single-split scan stage (Par.spread, guide §2.5)
    val blobs = graft.operators.Par.spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        val len = 16384 + (id % 5).toInt * 16384
        val b = new Array[Byte](len)
        var i = 0
        while (i < len) {
          b(i) = if (seed.nonEmpty) seed(i % seed.length) else (i + id).toByte
          i += 1
        }
        (id % 3) match {
          case 0 => b(0) = 0xff.toByte; b(1) = 0xd8.toByte
          case 1 => b(0) = 0x89.toByte; b(1) = 'P'.toByte
          case _ => b(0) = 0; b(1) = 0
        }
        MediaRecord(id, "image", b)
      }
    // avg blob = 48 KiB; cap each task at ~8 MiB of blob bytes
    val sized = Multimodal.repartitionBySize(blobs.toDF(), nDocs * 49152L, 8L << 20)
    Multimodal.decode(sized.as[MediaRecord])
      .map { m =>
        (m.mediaId, m.meta.mimeType, m.meta.durationMs,
          graft.multimodal.Multimodal.StubCodec.resize(m.content, 32768).length,
          graft.multimodal.Multimodal.StubCodec.sampleFrames(m.content, 4).length)
      }
      .toDF("media_id", "mime", "duration_ms", "resized_len", "n_frames")
      .orderBy(col("media_id"))
  }

  /** Skew-safe salted join (build brief: "salting for skew"): the fact
    * side (lineitem) is salted per-row, the dim side (orders) replicated
    * once per salt bucket, and the join runs on (orderkey, salt) — a hot
    * orderkey's rows land on 8 reducers instead of one. The oracle is
    * the PLAIN join: salting must not change a single row, which is the
    * whole correctness claim of [[graft.operators.Skew.saltedJoin]]. */
  val q44SaltedJoin: Q = Q(
    "q44_salted_join",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    // prune BEFORE salting: the salt hashes every column it is given and
    // the dim side replicates buckets×, so the operator gets exactly the
    // columns the query needs and nothing else rides the 8× shuffle
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.Skew.saltedJoin(li, ord, Seq("l_orderkey"), buckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** As-of join (point-in-time enrichment): sparse per-user "rate
    * updates" (every 20th event) join onto the interleaved fact events
    * at the latest update at-or-before each fact timestamp. The oracle
    * is DuckDB's NATIVE `ASOF LEFT JOIN` — the composed window
    * formulation must reproduce the primitive exactly, including the
    * inclusive equal-timestamp case and null for facts with no prior
    * update. */
  val q45AsofJoin: Q = Q(
    "q45_asof_join",
    """WITH dim AS (
      |  SELECT user_id, ts, max(value) AS rate FROM events
      |  WHERE event_id % 20 = 0 GROUP BY user_id, ts),
      |fact AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_id % 20 <> 0)
      |SELECT f.event_id, f.user_id, f.ts, d.rate
      |FROM fact f ASOF LEFT JOIN dim d
      |  ON f.user_id = d.user_id AND f.ts >= d.ts
      |ORDER BY f.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val dim = ev.filter(col("event_id") % 20 === 0)
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("rate"))
    val fact = ev.filter(col("event_id") % 20 =!= 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOf.joinLeft(fact, dim, Seq("user_id"), "ts", Seq("rate"))
      .orderBy(col("event_id"))
  }

  /** Range join (interval containment): every 50th event opens a
    * 24-hour per-user interval; the other events join every interval
    * containing them. The Spark side is the bucketed equi-join rewrite
    * ([[graft.operators.RangeJoin]], bucket = the interval width so dim
    * rows explode to ≤ 2 buckets); the oracle is the naive inequality
    * join — the rewrite must reproduce it exactly. */
  val q46RangeJoin: Q = Q(
    "q46_range_join",
    """WITH dim AS (
      |  SELECT event_id AS interval_id, user_id,
      |         epoch_us(ts) AS start_us, epoch_us(ts) + 86400000000 AS end_us
      |  FROM events WHERE event_id % 50 = 0),
      |fact AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_id % 50 <> 0)
      |SELECT f.event_id, f.user_id, d.interval_id
      |FROM fact f JOIN dim d
      |  ON f.user_id = d.user_id AND f.ts_us BETWEEN d.start_us AND d.end_us
      |ORDER BY f.event_id, d.interval_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val dim = ev.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("interval_id"), col("user_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) + 86400000000L).as("end_us"))
    val fact = ev.filter(col("event_id") % 50 =!= 0)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    graft.operators.RangeJoin.join(fact, dim, Seq("user_id"),
        "ts_us", "start_us", "end_us", bucketWidth = 86400000000L)
      .select(col("event_id"), col("user_id"), col("interval_id"))
      .orderBy(col("event_id"), col("interval_id"))
  }

  /** Z-order layout keys ([[graft.operators.ZOrder]]): interleave the
    * user bucket and the time bucket so a write sorted by the key
    * clusters rows close in BOTH dimensions into the same files —
    * parquet min/max pruning then serves 2-D range predicates, which a
    * single-column sort can only prune on its leading dimension. The
    * key is pure codegen'd bit arithmetic; the oracle runs the SAME
    * shift/mask cascade generated from the same constants. */
  val q47ZOrderLayout: Q = Q(
    "q47_zorder_layout",
    s"""WITH b AS (
       |  SELECT event_id,
       |         CAST(user_id % 1024 AS BIGINT) AS xb,
       |         CAST((epoch_us(ts) // 60000000) % 1024 AS BIGINT) AS yb
       |  FROM events)
       |SELECT event_id, xb, yb,
       |       CAST(${graft.operators.ZOrder.interleave2Sql("xb", "yb")} AS BIGINT) AS zkey
       |FROM b
       |ORDER BY zkey, event_id""".stripMargin) { (s, d) =>
    val b = Tables.events(s, d).select(
      col("event_id"),
      (col("user_id") % 1024).as("xb"),
      (expr("unix_micros(ts) div 60000000") % 1024).as("yb"))
    b.select(col("event_id"), col("xb"), col("yb"),
        graft.operators.ZOrder.interleave2(col("xb"), col("yb")).as("zkey"))
      .orderBy(col("zkey"), col("event_id"))
  }

  /** REAL image pipeline through the JDK's own codec (`javax.imageio` —
    * no external libs): each doc synthesizes a small RGB image from
    * closed-form pixel arithmetic, PNG-ENCODES it (real encoder), then
    * runs the real decode → mime sniff → integer nearest-neighbor
    * resize to 4×3 → 4-bucket integer luma histogram. PNG is lossless
    * and every step is integral, so the DuckDB oracle recomputes the
    * expected stats purely from the generating formulas — it never
    * touches a PNG, making it fully independent of `javax.imageio`. */
  val m2ImagePipeline: Q = Q(
    "m2_image_pipeline",
    """WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS sw,
      |            CAST(3 + doc_id % 4 AS BIGINT) AS sh
      |     FROM documents WHERE doc_id % 7 = 0),
      |px AS (
      |  SELECT doc_id,
      |    ((299 * ((doc_id*31 + ((dx*sw)//4)*7 + ((dy*sh)//3)*13) % 256)
      |    + 587 * ((doc_id*17 + ((dx*sw)//4)*5 + ((dy*sh)//3)*11) % 256)
      |    + 114 * ((doc_id*23 + ((dx*sw)//4)*3 + ((dy*sh)//3)*19) % 256)) // 1000) * 4 // 256 AS bk
      |  FROM d, unnest(range(4)) AS ux(dx), unnest(range(3)) AS uy(dy)),
      |agg AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN bk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
      |  CAST(sum(CASE WHEN bk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
      |  CAST(sum(CASE WHEN bk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
      |  CAST(sum(CASE WHEN bk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
      |  FROM px GROUP BY doc_id)
      |SELECT d.doc_id AS media_id, 'image/png' AS mime,
      |       CAST(sw AS INTEGER) AS width, CAST(sh AS INTEGER) AS height,
      |       h0, h1, h2, h3
      |FROM d JOIN agg USING (doc_id) ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal.JvmImageCodec
    // only the media subset pays the codec (a real pipeline decodes
    // media docs, not the whole corpus); the subset is closed-form so
    // the oracle applies the same gate
    Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 7 === 0).as[Long]
      .map { id =>
        val sw = 4 + (id % 5).toInt
        val sh = 3 + (id % 4).toInt
        val img = new java.awt.image.BufferedImage(sw, sh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < sh) {
          var x = 0
          while (x < sw) {
            val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val g = ((id * 17 + x * 5 + y * 11) % 256).toInt
            val b = ((id * 23 + x * 3 + y * 19) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val png = JvmImageCodec.encodePng(img) // real PNG encoder
        // decode ONCE and derive meta + pixels from the same raster
        // (a second full decode measured ~1/3 of this query's cost)
        val dec = JvmImageCodec.decodeImage(png).get
        val mime = graft.multimodal.Multimodal.StubCodec.sniffMime(png)
        val hist = JvmImageCodec.lumaHistogram(
          JvmImageCodec.resizeNearest(dec, 4, 3), 4)
        (id, mime, dec.getWidth, dec.getHeight,
          hist(0), hist(1), hist(2), hist(3))
      }
      .toDF("media_id", "mime", "width", "height", "h0", "h1", "h2", "h3")
      .orderBy(col("media_id"))
  }

  /** REAL audio pipeline through the JDK's `javax.sound.sampled`: each
    * doc synthesizes closed-form s16 mono PCM, WAV-encodes it, then
    * runs the REAL header+frame decode (AudioSystem) and integer
    * features (Σ|sample|, peak). Like m2, the oracle recomputes
    * everything from the generating formulas and never parses a WAV. */
  val m3AudioPipeline: Q = Q(
    "m3_audio_pipeline",
    """WITH d AS (SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n FROM documents),
      |s AS (SELECT doc_id, (doc_id*31 + i*97) % 4001 - 2000 AS v
      |      FROM d, unnest(range(n)) AS u(i))
      |SELECT d.doc_id AS media_id, CAST(8000 AS INTEGER) AS sample_rate,
      |       CAST(1 AS INTEGER) AS channels, CAST(16 AS INTEGER) AS bits,
      |       n AS n_frames, n * 1000 // 8000 AS duration_ms,
      |       CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
      |       CAST(max(abs(v)) AS BIGINT) AS peak
      |FROM d JOIN s USING (doc_id)
      |GROUP BY d.doc_id, n ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal.JvmAudioCodec
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val n = 64 + (id % 64).toInt
        val samples = Array.tabulate(n)(i => ((id * 31 + i * 97) % 4001 - 2000).toShort)
        val wav = JvmAudioCodec.encodeWavS16Mono(samples, 8000)
        val (meta, pcm) = JvmAudioCodec.decode(wav).get // REAL AudioSystem parse
        val (absSum, peak) = JvmAudioCodec.s16Features(pcm)
        (id, meta.sampleRate, meta.channels, meta.bitsPerSample,
          meta.nFrames, meta.durationMs, absSum, peak)
      }
      .toDF("media_id", "sample_rate", "channels", "bits", "n_frames",
        "duration_ms", "abs_sum", "peak")
      .orderBy(col("media_id"))
  }

  /** REAL frame-sampling pipeline over a multi-frame animation: each
    * doc synthesizes an animated GIF (uniform gray value per frame —
    * the regime where GIF palette round-trip is pixel-exact, measured),
    * encodes it with the JDK's real GIF sequence writer, then runs the
    * real multi-frame decode (frame count, dims), samples every 2nd
    * frame, and sums the sampled frames' uniform luma. The oracle
    * recomputes everything from the generating formulas and never
    * parses a GIF. */
  val m4VideoPipeline: Q = Q(
    "m4_video_pipeline",
    """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 4 AS INTEGER) AS nf,
      |            CAST(5 + doc_id % 3 AS INTEGER) AS w, CAST(4 + doc_id % 2 AS INTEGER) AS h
      |     FROM documents WHERE doc_id % 7 = 0),
      |f AS (SELECT doc_id, fi, (doc_id*37 + fi*53) % 256 AS v
      |      FROM d, unnest(range(nf)) AS u(fi)),
      |sampled AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
      |                   CAST(sum(v) AS BIGINT) AS sampled_luma_sum
      |            FROM f WHERE fi % 2 = 0 GROUP BY doc_id)
      |SELECT d.doc_id AS media_id, 'image/gif' AS mime, CAST(nf AS BIGINT) AS n_frames,
      |       w AS width, h AS height, n_sampled, sampled_luma_sum
      |FROM d JOIN sampled USING (doc_id) ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal.{JvmGifCodec, StubCodec}
    // media-subset gate, mirrored in the oracle (see m2)
    Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 7 === 0).as[Long]
      .map { id =>
        val nf = 2 + (id % 4).toInt
        val w = 5 + (id % 3).toInt
        val h = 4 + (id % 2).toInt
        val frames = (0 until nf).map { fi =>
          val v = ((id * 37 + fi * 53) % 256).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
            y += 1
          }
          img
        }
        val gif = JvmGifCodec.encodeAnimatedGif(frames) // real sequence writer
        val dec = JvmGifCodec.decodeFrames(gif).get // real multi-frame decode
        val sampled = JvmGifCodec.sampleFrames(dec, 2)
        val lumaSum = sampled.map(f => (f.getRGB(0, 0) & 0xff).toLong).sum
        (id, StubCodec.sniffMime(gif), dec.length.toLong,
          dec.head.getWidth, dec.head.getHeight, sampled.length.toLong, lumaSum)
      }
      .toDF("media_id", "mime", "n_frames", "width", "height", "n_sampled",
        "sampled_luma_sum")
      .orderBy(col("media_id"))
  }

  /** REAL video-container pipeline: each doc synthesizes uniform-gray
    * frames, encodes a genuine MJPEG AVI (hand-written RIFF layout),
    * then runs the REAL container walk (avih meta, movi chunk
    * enumeration) and the REAL per-frame JDK JPEG decode, samples every
    * 2nd frame and sums the decoded luma. Uniform-gray JPEG round-trips
    * pixel-exactly (measured over all 256 values and odd dims), so the
    * oracle recomputes everything from the generating formulas and
    * never parses an AVI. */
  val m5MjpegAviPipeline: Q = Q(
    "m5_mjpeg_avi_pipeline",
    """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 4 AS INTEGER) AS nf,
      |            CAST(8 + doc_id % 5 AS INTEGER) AS w, CAST(6 + doc_id % 3 AS INTEGER) AS h
      |     FROM documents WHERE doc_id % 11 = 0),
      |f AS (SELECT doc_id, fi, (doc_id*41 + fi*59) % 256 AS v
      |      FROM d, unnest(range(nf)) AS u(fi)),
      |sampled AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
      |                   CAST(sum(v) AS BIGINT) AS sampled_luma_sum
      |            FROM f WHERE fi % 2 = 0 GROUP BY doc_id)
      |SELECT d.doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
      |       w AS width, h AS height, CAST(nf AS BIGINT) * 100 AS duration_ms,
      |       n_sampled, sampled_luma_sum
      |FROM d JOIN sampled USING (doc_id) ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal.{JvmAviCodec, JvmGifCodec}
    Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 11 === 0).as[Long]
      .map { id =>
        val nf = 2 + (id % 4).toInt
        val w = 8 + (id % 5).toInt
        val h = 6 + (id % 3).toInt
        val frames = (0 until nf).map { fi =>
          val v = ((id * 41 + fi * 59) % 256).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
            y += 1
          }
          img
        }
        val avi = JvmAviCodec.encodeMjpegAvi(frames, fps = 10)
        val (meta, dec) = JvmAviCodec.decodeMjpegAvi(avi).get // real RIFF + JPEG decode
        val sampled = JvmGifCodec.sampleFrames(dec, 2)
        val lumaSum = sampled.map(f => (f.getRGB(0, 0) & 0xff).toLong).sum
        (id, meta.nFrames, meta.width, meta.height, meta.durationMs,
          sampled.length.toLong, lumaSum)
      }
      .toDF("media_id", "n_frames", "width", "height", "duration_ms",
        "n_sampled", "sampled_luma_sum")
      .orderBy(col("media_id"))
  }

  /** REAL raw-video pipeline: each doc synthesizes uniform-gray frames,
    * encodes a genuine YUV4MPEG2 Cmono stream
    * ([[graft.multimodal.Multimodal.JvmY4mCodec]] — the uncompressed
    * interchange format of every FFmpeg/x264 toolchain), then runs the
    * real header parse + FRAME walk + luma rasterization, samples every
    * 2nd frame and sums the decoded luma. For gray rasters the integer
    * luma kernel is the identity (299+587+114 = 1000), so the round
    * trip is pixel-exact and the oracle recomputes everything from the
    * generating formulas — it never parses a stream. Duration follows
    * the header's F10:1 rate: nf·100 ms, like m5. */
  val m15Y4mPipeline: Q = Q(
    "m15_y4m_pipeline",
    """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 5 AS INTEGER) AS nf,
      |            CAST(7 + doc_id % 4 AS INTEGER) AS w, CAST(5 + doc_id % 3 AS INTEGER) AS h
      |     FROM documents WHERE doc_id % 13 = 0),
      |f AS (SELECT doc_id, fi, (doc_id*43 + fi*61) % 256 AS v
      |      FROM d, unnest(range(nf)) AS u(fi)),
      |sampled AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
      |                   CAST(sum(v) AS BIGINT) AS sampled_luma_sum
      |            FROM f WHERE fi % 2 = 0 GROUP BY doc_id)
      |SELECT d.doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
      |       w AS width, h AS height, CAST(nf AS BIGINT) * 100 AS duration_ms,
      |       n_sampled, sampled_luma_sum
      |FROM d JOIN sampled USING (doc_id) ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.Multimodal.{JvmGifCodec, JvmY4mCodec}
    Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 13 === 0).as[Long]
      .map { id =>
        val nf = 2 + (id % 5).toInt
        val w = 7 + (id % 4).toInt
        val h = 5 + (id % 3).toInt
        val frames = (0 until nf).map { fi =>
          val v = ((id * 43 + fi * 61) % 256).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
            y += 1
          }
          img
        }
        val y4m = JvmY4mCodec.encodeY4mMono(frames, fpsNum = 10, fpsDen = 1)
        val (meta, dec) = JvmY4mCodec.decodeY4m(y4m).get // real header + FRAME walk
        val sampled = JvmGifCodec.sampleFrames(dec, 2)
        val lumaSum = sampled.map(f => (f.getRGB(0, 0) & 0xff).toLong).sum
        (id, meta.nFrames, meta.width, meta.height, meta.durationMs,
          sampled.length.toLong, lumaSum)
      }
      .toDF("media_id", "n_frames", "width", "height", "duration_ms",
        "n_sampled", "sampled_luma_sum")
      .orderBy(col("media_id"))
  }

  /** Perceptual image near-dup (the LAION-style multimodal dedup step):
    * synthesize groups of 4 perceptually-near images from a closed-form
    * 64-bit bit pattern (each group member flips 0/1/2/3 chosen bits of
    * the group's base pattern; the luma grid walks ±10 per step so the
    * comparison direction IS the bit), PNG-encode with the real
    * encoder, then run the REAL decode → 9×8 resize → dHash →
    * pigeonhole pair search at Hamming ≤ 3. Every step is integral, so
    * the oracle computes each image's dHash and the pair set purely
    * from the bit formulas — it never touches a pixel. */
  /** The m6 fixture's planted dHash bit formula. */
  private def m6Bit(i: Long, k: Int): Boolean = {
    val base = k < 63 && ((i / 4) * 2654435761L + k * 40503L) % 97 < 48
    val flip = (i % 4, k) match {
      case (1, 1) => true
      case (2, 2) | (2, 3) => true
      case (3, kk) if kk >= 4 && kk <= 6 => true
      case _ => false
    }
    base ^ flip
  }

  /** One m6-corpus PNG, pure function of the image id: 24 groups of 4
    * near-dup members (0/1/2/3 planted bit flips of the group pattern),
    * luma-walked ±10 per dHash bit so the comparison direction IS the
    * bit. Shared by m6 (pairs) and m14 (clusters). */
  private[queries] def m6Png(i: Long): Array[Byte] = {
    import graft.multimodal.Multimodal.JvmImageCodec
    // luma walk per 9-pixel row of the 9x8 target grid; the 18x16
    // source is uniform 2x2 blocks so the nearest resize recovers it
    val l = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      l(y)(0) = 128
      var x = 0
      while (x < 8) {
        l(y)(x + 1) = l(y)(x) + (if (m6Bit(i, y * 8 + x)) 10 else -10)
        x += 1
      }
      y += 1
    }
    val img = new java.awt.image.BufferedImage(18, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var py = 0
    while (py < 16) {
      var px = 0
      while (px < 18) {
        val g = l(py / 2)(px / 2)
        img.setRGB(px, py, (g << 16) | (g << 8) | g)
        px += 1
      }
      py += 1
    }
    JvmImageCodec.encodePng(img)
  }

  val m6ImageNearDup: Q = {
    val n = 96
    Q(
      "m6_image_neardup",
      s"""WITH img AS (SELECT i FROM range($n) t(i)),
         |bits AS (
         |  SELECT i, k,
         |    xor(CASE WHEN k < 63 AND ((i // 4) * 2654435761 + k * 40503) % 97 < 48
         |             THEN 1 ELSE 0 END,
         |        CASE WHEN i % 4 = 1 AND k = 1 THEN 1
         |             WHEN i % 4 = 2 AND k IN (2, 3) THEN 1
         |             WHEN i % 4 = 3 AND k IN (4, 5, 6) THEN 1
         |             ELSE 0 END) AS b
         |  FROM img, unnest(range(63)) u(k)), -- bit 63 is 0 by construction (shift-safe)
         |sig AS (SELECT i, CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
         |        FROM bits GROUP BY i)
         |SELECT a.i AS da, b.i AS db,
         |       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.i < b.i
         |WHERE bit_count(xor(a.h, b.h)) <= 3
         |ORDER BY da, db""".stripMargin) { (s, _) =>
      import s.implicits._
      val media = s.range(n).as[Long].map(i => (i, m6Png(i))).toDF("img_id", "png")
      val sigs = graft.operators.ImageDedup.dhashSignatures(media, "img_id", "png")
      graft.operators.ImageDedup.nearPairs(sigs, maxDist = 3)
        .orderBy(col("da"), col("db"))
    }
  }

  /** Perceptual AUDIO near-dup (the m6 discipline on the time axis):
    * groups of 4 clips share a closed-form 63-bit energy-contour
    * pattern with planted bit flips; each clip synthesizes s16 PCM
    * whose per-window mean walks ±50 by the bit, WAV-encodes with the
    * real encoder, decodes through the real AudioSystem and
    * fingerprints the energy contour; pairs at Hamming ≤ 3 via the
    * shared 64-bit pigeonhole. The oracle computes fingerprints and
    * pairs purely from the bit formulas — it never parses a WAV. */
  val m7AudioNearDup: Q = {
    val n = 96
    Q(
      "m7_audio_neardup",
      s"""WITH clip AS (SELECT i FROM range($n) t(i)),
         |bits AS (
         |  SELECT i, k,
         |    xor(CASE WHEN ((i // 4) * 40503 + k * 2654435761) % 89 < 44
         |             THEN 1 ELSE 0 END,
         |        CASE WHEN i % 4 = 1 AND k = 1 THEN 1
         |             WHEN i % 4 = 2 AND k IN (2, 3) THEN 1
         |             WHEN i % 4 = 3 AND k IN (4, 5, 6) THEN 1
         |             ELSE 0 END) AS b
         |  FROM clip, unnest(range(63)) u(k)),
         |sig AS (SELECT i, CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
         |        FROM bits GROUP BY i)
         |SELECT a.i AS da, b.i AS db,
         |       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.i < b.i
         |WHERE bit_count(xor(a.h, b.h)) <= 3
         |ORDER BY da, db""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.multimodal.Multimodal.JvmAudioCodec
      def bit(i: Long, k: Int): Boolean = {
        val base = ((i / 4) * 40503L + k * 2654435761L) % 89 < 44
        val flip = (i % 4, k) match {
          case (1, 1) => true
          case (2, 2) | (2, 3) => true
          case (3, kk) if kk >= 4 && kk <= 6 => true
          case _ => false
        }
        base ^ flip
      }
      val media = s.range(n).as[Long].map { i =>
        val m = new Array[Int](64)
        m(0) = 5000
        var w = 0
        while (w < 63) {
          m(w + 1) = m(w) + (if (bit(i, w)) 50 else -50)
          w += 1
        }
        val samples = new Array[Short](256) // 4 samples per window
        var t = 0
        while (t < 256) { samples(t) = m(t / 4).toShort; t += 1 }
        (i, JvmAudioCodec.encodeWavS16Mono(samples, 8000))
      }.toDF("clip_id", "wav")
      val sigs = graft.operators.AudioDedup.signatures(media, "clip_id", "wav")
      graft.operators.ImageDedup.nearPairs(sigs, maxDist = 3)
        .orderBy(col("da"), col("db"))
    }
  }

  /** Perceptual VIDEO near-dup: the m6/m7 discipline on the frame
    * axis. Groups of 4 clips share a closed-form 63-bit temporal
    * pattern with planted flips; each clip is 64 uniform-gray frames
    * whose gray walks ±1 by the bit (uniform-gray MJPEG round-trips
    * pixel-exact — the m5-measured regime), encoded as real
    * MJPEG-in-AVI, decoded through the real RIFF walk + JPEG decode,
    * fingerprinted by mean-luma contour, and paired at Hamming ≤ 3 via
    * the shared 64-bit pigeonhole. Oracle = the bit formulas alone. */
  val m8VideoNearDup: Q = {
    val n = 64 // clips
    Q(
      "m8_video_neardup",
      s"""WITH clip AS (SELECT i FROM range($n) t(i)),
         |bits AS (
         |  SELECT i, k,
         |    xor(CASE WHEN ((i // 4) * 2654435761 + k * 48271) % 83 < 41
         |             THEN 1 ELSE 0 END,
         |        CASE WHEN i % 4 = 1 AND k = 1 THEN 1
         |             WHEN i % 4 = 2 AND k IN (2, 3) THEN 1
         |             WHEN i % 4 = 3 AND k IN (4, 5, 6) THEN 1
         |             ELSE 0 END) AS b
         |  FROM clip, unnest(range(63)) u(k)),
         |sig AS (SELECT i, CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
         |        FROM bits GROUP BY i)
         |SELECT a.i AS da, b.i AS db,
         |       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.i < b.i
         |WHERE bit_count(xor(a.h, b.h)) <= 3
         |ORDER BY da, db""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.multimodal.Multimodal.JvmAviCodec
      def bit(i: Long, k: Int): Boolean = {
        val base = ((i / 4) * 2654435761L + k * 48271L) % 83 < 41
        val flip = (i % 4, k) match {
          case (1, 1) => true
          case (2, 2) | (2, 3) => true
          case (3, kk) if kk >= 4 && kk <= 6 => true
          case _ => false
        }
        base ^ flip
      }
      val media = s.range(n).as[Long].map { i =>
        val g = new Array[Int](64)
        g(0) = 128
        var w = 0
        while (w < 63) { g(w + 1) = g(w) + (if (bit(i, w)) 1 else -1); w += 1 }
        val frames = (0 until 64).map { f =>
          val img = new java.awt.image.BufferedImage(8, 6,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val v = g(f)
          var y = 0
          while (y < 6) {
            var x = 0
            while (x < 8) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
            y += 1
          }
          img
        }
        (i, JvmAviCodec.encodeMjpegAvi(frames, 10))
      }.toDF("clip_id", "avi")
      val sigs = graft.operators.VideoDedup.signatures(media, "clip_id", "avi")
      graft.operators.ImageDedup.nearPairs(sigs, maxDist = 3)
        .orderBy(col("da"), col("db"))
    }
  }

  /** Composed media dedup — the crawl-scale front door: an EXACT
    * content-hash lane (byte-identical copies collapse on md5, keeper
    * = min id — at crawl scale MOST image dups are byte-identical, so
    * this lane also shrinks the perceptual decode pass itself) feeding
    * the perceptual lane (dHash + pigeonhole over exact keepers only,
    * SemDeDup keep-first dominance). Fixture: 96 images over 24
    * distinct contents (i % 24 — four byte-identical copies each);
    * contents follow the m6 closed-form bit pattern in groups of 4
    * near variants. The oracle replays the exact families from the
    * modulus and the perceptual verdicts from the bit formulas — it
    * never touches a pixel. */
  val m9MediaDedup: Q = {
    val n = 96
    Q(
      "m9_media_dedup",
      s"""WITH img AS (SELECT i FROM range($n) t(i)),
         |ex AS (SELECT i, i % 24 AS c FROM img),
         |bits AS (
         |  SELECT c, k,
         |    xor(CASE WHEN k < 63 AND ((c // 4) * 2654435761 + k * 40503) % 97 < 48
         |             THEN 1 ELSE 0 END,
         |        CASE WHEN c % 4 = 1 AND k = 1 THEN 1
         |             WHEN c % 4 = 2 AND k IN (2, 3) THEN 1
         |             WHEN c % 4 = 3 AND k IN (4, 5, 6) THEN 1
         |             ELSE 0 END) AS b
         |  FROM (SELECT DISTINCT i % 24 AS c FROM img), unnest(range(63)) u(k)),
         |sig AS (SELECT c, CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
         |        FROM bits GROUP BY c),
         |np AS (SELECT b.c AS c, min(a.c) AS near_of
         |       FROM sig a JOIN sig b ON a.c < b.c
         |       WHERE bit_count(xor(a.h, b.h)) <= 3
         |       GROUP BY b.c)
         |SELECT e.i AS media_id,
         |  CASE WHEN e.i != e.c THEN 'exact_dup'
         |       WHEN np.near_of IS NOT NULL THEN 'near_dup'
         |       ELSE 'keep' END AS action,
         |  CAST(CASE WHEN e.i != e.c THEN e.c ELSE np.near_of END AS BIGINT) AS dup_of
         |FROM ex e LEFT JOIN np ON e.c = np.c
         |ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.multimodal.Multimodal.JvmImageCodec
      def bit(c: Long, k: Int): Boolean = {
        val base = k < 63 && ((c / 4) * 2654435761L + k * 40503L) % 97 < 48
        val flip = (c % 4, k) match {
          case (1, 1) => true
          case (2, 2) | (2, 3) => true
          case (3, kk) if kk >= 4 && kk <= 6 => true
          case _ => false
        }
        base ^ flip
      }
      val media = s.range(n).as[Long].map { i =>
        val c = i % 24 // the content key: same c → byte-identical PNG
        val l = Array.ofDim[Int](8, 9)
        var y = 0
        while (y < 8) {
          l(y)(0) = 128
          var x = 0
          while (x < 8) {
            l(y)(x + 1) = l(y)(x) + (if (bit(c, y * 8 + x)) 10 else -10)
            x += 1
          }
          y += 1
        }
        val img = new java.awt.image.BufferedImage(18, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var py = 0
        while (py < 16) {
          var px = 0
          while (px < 18) {
            val g = l(py / 2)(px / 2)
            img.setRGB(px, py, (g << 16) | (g << 8) | g)
            px += 1
          }
          py += 1
        }
        (i, JvmImageCodec.encodePng(img))
      }.toDF("img_id", "png")
      graft.operators.MediaDedup.imageDedup(media, "img_id", "png", maxDist = 3)
        .orderBy(col("media_id"))
    }
  }

  /** Media quality gates (the LAION/DataComp curation step): integer
    * size / uniform-luma / aspect rules over one decode pass — the
    * Gopher-gates discipline on images. Fixture: 96 images whose
    * dimensions and luma field follow closed-form formulas planting
    * every rule (tracking-pixel-small i%7, banner-aspect i%13,
    * solid-placeholder i%11); the oracle replays dimensions, the
    * max-min luma spread over the pixel grid, and the verdicts purely
    * from the formulas — it never touches a pixel. */
  val m10MediaQuality: Q = {
    val n = 96
    Q(
      "m10_media_quality",
      s"""WITH img AS (SELECT i FROM range($n) t(i)),
         |dim AS (SELECT i,
         |  CASE WHEN i % 7 = 0 THEN 4 WHEN i % 13 = 0 THEN 48
         |       ELSE 8 + (i % 5) * 4 END AS w,
         |  CASE WHEN i % 13 = 0 THEN 8 ELSE 8 + ((i // 5) % 4) * 4 END AS h
         |  FROM img),
         |gx AS (SELECT i, w, h, unnest(range(w)) AS x FROM dim),
         |gxy AS (SELECT i, w, h, x, unnest(range(h)) AS y FROM gx),
         |sp0 AS (SELECT i, max((x * 7 + y * 5 + i) % 150)
         |               - min((x * 7 + y * 5 + i) % 150) AS s
         |        FROM gxy GROUP BY i),
         |st AS (SELECT d.i, d.w, d.h,
         |       CASE WHEN d.i % 11 = 0 THEN 0 ELSE sp0.s END AS spread
         |       FROM dim d JOIN sp0 USING (i)),
         |v AS (SELECT i, w, h, spread,
         |      (w < 8 OR h < 8) AS small,
         |      (spread < 10) AS uniform,
         |      (greatest(w, h) > 4 * least(w, h)) AS aspect
         |      FROM st)
         |SELECT i AS media_id, CAST(w AS INTEGER) AS width,
         |       CAST(h AS INTEGER) AS height,
         |       CAST(spread AS INTEGER) AS luma_spread,
         |       (NOT small AND NOT uniform AND NOT aspect) AS keep,
         |       concat_ws(',',
         |         CASE WHEN aspect THEN 'aspect' END,
         |         CASE WHEN small THEN 'small' END,
         |         CASE WHEN uniform THEN 'uniform' END) AS reasons
         |FROM v ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.multimodal.Multimodal.JvmImageCodec
      val media = s.range(n).as[Long].map { i =>
        val w = if (i % 7 == 0) 4 else if (i % 13 == 0) 48 else 8 + (i % 5).toInt * 4
        val h = if (i % 13 == 0) 8 else 8 + ((i / 5) % 4).toInt * 4
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = if (i % 11 == 0) 100
              else 30 + ((x * 7 + y * 5 + i) % 150).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        (i, JvmImageCodec.encodePng(img))
      }.toDF("img_id", "png")
      graft.operators.MediaQuality.imageGates(media, "img_id", "png",
        minW = 8, minH = 8, minSpread = 10, maxAspect = 4)
        .orderBy(col("media_id"))
    }
  }

  /** Audio quality gates — the speech-corpus curation rules in the m10
    * discipline: duration / silence-ratio / clipping-ratio verdicts,
    * all integer-exact over real WAV encode→decode. Fixture: 96 clips
    * whose sample streams follow closed-form formulas planting every
    * rule (too-short i%7, silence-heavy i%11, clipped i%13); the
    * oracle replays sample values, integer percents and verdicts
    * purely from the formulas — it never parses a WAV. */
  val m11AudioQuality: Q = {
    val n = 96
    Q(
      "m11_audio_quality",
      s"""WITH clip AS (SELECT i FROM range($n) t(i)),
         |nn AS (SELECT i, CASE WHEN i % 7 = 0 THEN 32 ELSE 256 END AS ns FROM clip),
         |smp AS (SELECT i, ns, unnest(range(ns)) AS t FROM nn),
         |sv AS (SELECT i, ns, t,
         |  CASE WHEN i % 11 = 0 THEN CASE WHEN t % 4 = 0 THEN 5000 ELSE 10 END
         |       WHEN i % 13 = 0 THEN CASE WHEN t % 3 = 0 THEN 32760 ELSE 1000 END
         |       ELSE 1000 + (t * 37 + i) % 2000 END AS s
         |  FROM smp),
         |agg AS (SELECT i, ns,
         |  CAST(sum(CASE WHEN abs(s) < 328 THEN 1 ELSE 0 END) AS BIGINT) AS n_sil,
         |  CAST(sum(CASE WHEN abs(s) >= 32700 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip
         |  FROM sv GROUP BY i, ns),
         |v AS (SELECT i, ns,
         |      (n_sil * 100) // ns AS sil_pct, (n_clip * 100) // ns AS cl_pct,
         |      (ns < 64) AS short,
         |      ((n_sil * 100) // ns > 50) AS silent,
         |      ((n_clip * 100) // ns > 10) AS clipped
         |      FROM agg)
         |SELECT i AS media_id, CAST(ns AS BIGINT) AS n_samples,
         |       CAST(sil_pct AS BIGINT) AS silence_pct,
         |       CAST(cl_pct AS BIGINT) AS clip_pct,
         |       (NOT short AND NOT silent AND NOT clipped) AS keep,
         |       concat_ws(',',
         |         CASE WHEN clipped THEN 'clipped' END,
         |         CASE WHEN short THEN 'short' END,
         |         CASE WHEN silent THEN 'silent' END) AS reasons
         |FROM v ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.multimodal.Multimodal.JvmAudioCodec
      val media = s.range(n).as[Long].map { i =>
        val ns = if (i % 7 == 0) 32 else 256
        val samples = Array.tabulate[Short](ns) { t =>
          (if (i % 11 == 0) { if (t % 4 == 0) 5000 else 10 }
          else if (i % 13 == 0) { if (t % 3 == 0) 32760 else 1000 }
          else 1000 + ((t * 37 + i) % 2000).toInt).toShort
        }
        (i, JvmAudioCodec.encodeWavS16Mono(samples, 8000))
      }.toDF("clip_id", "wav")
      graft.operators.MediaQuality.audioGates(media, "clip_id", "wav",
        minSamples = 64, silenceAbs = 328, maxSilencePct = 50,
        clipAbs = 32700, maxClipPct = 10)
        .orderBy(col("media_id"))
    }
  }

  /** The composed MEDIA curation chain (the t30/q53 discipline):
    * quality gates → exact dedup → perceptual near-dup in ONE decode
    * pass ([[graft.operators.MediaCurate]]). Fixture: the m9 corpus
    * (96 images, 24 contents, 4 byte-identical copies each, m6-style
    * near groups) with contents c%11==0 replaced by UNIFORM 128
    * placeholders — the blank-thumbnail class that must gate out
    * before ever reaching the pair search. Oracle: m9's formulas plus
    * the gate rule; every non-uniform walk image has luma spread ≥ 10
    * by construction (adjacent cells differ by exactly 10), so the
    * gate reduces to the uniform test and the oracle never touches a
    * pixel. */
  /** The m12 fixture's planted dHash bit formula (shared with q54's
    * WARC-wrapped corpus). */
  private def m12Bit(c: Long, k: Int): Boolean = {
    val base = k < 63 && ((c / 4) * 2654435761L + k * 40503L) % 97 < 48
    val flip = (c % 4, k) match {
      case (1, 1) => true
      case (2, 2) | (2, 3) => true
      case (3, kk) if kk >= 4 && kk <= 6 => true
      case _ => false
    }
    base ^ flip
  }

  /** One m12-corpus PNG, pure function of the image id: 24 contents ×
    * 4 byte-identical copies; contents c%11==0 are uniform-128
    * placeholders; the rest walk the planted dHash bits in ±10 luma
    * steps. Reused by q54's WARC-wrapped corpus. */
  private[queries] def m12Png(i: Long): Array[Byte] = {
    import graft.multimodal.Multimodal.JvmImageCodec
    val c = i % 24
    val img = new java.awt.image.BufferedImage(18, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    if (c % 11 == 0) {
      var py = 0
      while (py < 16) {
        var px = 0
        while (px < 18) { img.setRGB(px, py, (128 << 16) | (128 << 8) | 128); px += 1 }
        py += 1
      }
    } else {
      val l = Array.ofDim[Int](8, 9)
      var y = 0
      while (y < 8) {
        l(y)(0) = 128
        var x = 0
        while (x < 8) {
          l(y)(x + 1) = l(y)(x) + (if (m12Bit(c, y * 8 + x)) 10 else -10)
          x += 1
        }
        y += 1
      }
      var py = 0
      while (py < 16) {
        var px = 0
        while (px < 18) {
          val g = l(py / 2)(px / 2)
          img.setRGB(px, py, (g << 16) | (g << 8) | g)
          px += 1
        }
        py += 1
      }
    }
    JvmImageCodec.encodePng(img)
  }

  /** The m12 verdict oracle (also q54's — the WARC wrap is a
    * pass-through of the same corpus). */
  private[queries] def m12OracleSql(n: Int): String =
    s"""WITH img AS (SELECT i FROM range($n) t(i)),
         |ex AS (SELECT i, i % 24 AS c FROM img),
         |q AS (SELECT c, (c % 11 = 0) AS gated
         |      FROM (SELECT DISTINCT i % 24 AS c FROM img)),
         |bits AS (
         |  SELECT c, k,
         |    xor(CASE WHEN k < 63 AND ((c // 4) * 2654435761 + k * 40503) % 97 < 48
         |             THEN 1 ELSE 0 END,
         |        CASE WHEN c % 4 = 1 AND k = 1 THEN 1
         |             WHEN c % 4 = 2 AND k IN (2, 3) THEN 1
         |             WHEN c % 4 = 3 AND k IN (4, 5, 6) THEN 1
         |             ELSE 0 END) AS b
         |  FROM (SELECT DISTINCT i % 24 AS c FROM img), unnest(range(63)) u(k)),
         |sig AS (SELECT c, CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
         |        FROM bits GROUP BY c),
         |np AS (SELECT b.c AS c, min(a.c) AS near_of
         |       FROM sig a JOIN sig b ON a.c < b.c
         |       JOIN q qa ON qa.c = a.c AND NOT qa.gated
         |       JOIN q qb ON qb.c = b.c AND NOT qb.gated
         |       WHERE bit_count(xor(a.h, b.h)) <= 3
         |       GROUP BY b.c)
         |SELECT e.i AS media_id,
         |  CASE WHEN q.gated THEN 'gated'
         |       WHEN e.i != e.c THEN 'exact_dup'
         |       WHEN np.near_of IS NOT NULL THEN 'near_dup'
         |       ELSE 'keep' END AS action,
         |  CAST(CASE WHEN q.gated THEN NULL
         |            WHEN e.i != e.c THEN e.c
         |            ELSE np.near_of END AS BIGINT) AS dup_of
         |FROM ex e JOIN q ON q.c = e.c LEFT JOIN np ON np.c = e.c
         |ORDER BY media_id""".stripMargin

  val m12MediaCurate: Q = {
    val n = 96
    Q(
      "m12_media_curate",
      m12OracleSql(n)) { (s, _) =>
      import s.implicits._
      val media = s.range(n).as[Long].map(i => (i, m12Png(i))).toDF("img_id", "png")
      graft.operators.MediaCurate.imageCurate(media, "img_id", "png",
        minW = 8, minH = 8, minSpread = 10, maxAspect = 4, maxDist = 3)
        .orderBy(col("media_id"))
    }
  }

  /** Video quality gates — completing the m10/m11 symmetry: frame
    * count / frame size / static-clip rules over real MJPEG-in-AVI
    * decode, integer-exact in the m5 uniform-gray regime. Fixture: 96
    * clips planting every rule from closed-form formulas (too-short
    * i%7, static i%11, tiny-frame i%13); the oracle replays frame
    * counts, dims and the temporal mean-luma spread purely from the
    * formulas — it never decodes a container. */
  val m13VideoQuality: Q = {
    val n = 96
    Q(
      "m13_video_quality",
      s"""WITH clip AS (SELECT i FROM range($n) t(i)),
         |cfg AS (SELECT i,
         |  CASE WHEN i % 7 = 0 THEN 4 ELSE 16 END AS nf,
         |  CASE WHEN i % 13 = 0 THEN 2 ELSE 8 END AS w,
         |  CASE WHEN i % 13 = 0 THEN 2 ELSE 6 END AS h
         |  FROM clip),
         |fr AS (SELECT i, nf, w, h, unnest(range(nf)) AS f FROM cfg),
         |lum AS (SELECT i, nf, w, h,
         |  CASE WHEN i % 11 = 0 THEN 100 ELSE 100 + (f * 7 + i) % 40 END AS v
         |  FROM fr),
         |agg AS (SELECT i, nf, w, h, max(v) - min(v) AS spread
         |        FROM lum GROUP BY i, nf, w, h),
         |v AS (SELECT i, nf, w, h, spread,
         |      (nf < 8) AS short, (w < 4 OR h < 4) AS small,
         |      (spread < 5) AS static FROM agg)
         |SELECT i AS media_id, CAST(nf AS BIGINT) AS n_frames,
         |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |       CAST(spread AS BIGINT) AS luma_spread,
         |       (NOT short AND NOT small AND NOT static) AS keep,
         |       concat_ws(',',
         |         CASE WHEN short THEN 'short' END,
         |         CASE WHEN small THEN 'small' END,
         |         CASE WHEN static THEN 'static' END) AS reasons
         |FROM v ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.multimodal.Multimodal.JvmAviCodec
      val media = s.range(n).as[Long].map { i =>
        val nf = if (i % 7 == 0) 4 else 16
        val (w, h) = if (i % 13 == 0) (2, 2) else (8, 6)
        val frames = (0 until nf).map { f =>
          val v = if (i % 11 == 0) 100 else 100 + ((f * 7 + i) % 40).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
            y += 1
          }
          img
        }
        (i, JvmAviCodec.encodeMjpegAvi(frames, 10))
      }.toDF("clip_id", "avi")
      graft.operators.MediaQuality.videoGates(media, "clip_id", "avi",
        minFrames = 8, minW = 4, minH = 4, minSpread = 5)
        .orderBy(col("media_id"))
    }
  }

  /** Media dup-CLUSTER resolution (the t14 discipline on perceptual
    * signatures, [[graft.operators.ImageDedup.clusters]]): m6's
    * pairwise verdicts closed into connected components — a~b, b~c
    * needs a transitive rule to pick ONE keeper for the family. The
    * oracle replays the dHash signatures from the m6 bit formulas and
    * closes the Hamming-≤3 relation with a recursive min-label
    * fixpoint (the t14 CTE shape), never touching a pixel. */
  val m14MediaClusters: Q = {
    val n = 96
    Q(
      "m14_media_clusters",
      s"""WITH RECURSIVE img AS (SELECT i FROM range($n) t(i)),
         |bits AS (
         |  SELECT i, k,
         |    xor(CASE WHEN k < 63 AND ((i // 4) * 2654435761 + k * 40503) % 97 < 48
         |             THEN 1 ELSE 0 END,
         |        CASE WHEN i % 4 = 1 AND k = 1 THEN 1
         |             WHEN i % 4 = 2 AND k IN (2, 3) THEN 1
         |             WHEN i % 4 = 3 AND k IN (4, 5, 6) THEN 1
         |             ELSE 0 END) AS b
         |  FROM img, unnest(range(63)) u(k)),
         |sig AS (SELECT i, CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
         |        FROM bits GROUP BY i),
         |nodes AS (SELECT DISTINCT h AS nd FROM sig),
         |e AS (SELECT a.nd AS u, b.nd AS v FROM nodes a JOIN nodes b
         |      ON a.nd < b.nd AND bit_count(xor(a.nd, b.nd)) <= 3),
         |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
         |reach(nd, l) AS (
         |  SELECT nd, nd FROM nodes
         |  UNION
         |  SELECT und.v, r.l FROM reach r JOIN und ON und.u = r.nd),
         |comp AS (SELECT nd, min(l) AS component FROM reach GROUP BY nd),
         |dc AS (SELECT s.i AS media_id, c.component AS cluster
         |       FROM sig s JOIN comp c ON s.h = c.nd),
         |keep AS (SELECT cluster, min(media_id) AS keeper_media_id FROM dc GROUP BY cluster)
         |SELECT media_id, cluster, keeper_media_id
         |FROM dc JOIN keep USING (cluster)
         |ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      val media = s.range(n).as[Long].map(i => (i, m6Png(i))).toDF("img_id", "png")
      val sigs = graft.operators.ImageDedup.dhashSignatures(media, "img_id", "png")
      graft.operators.ImageDedup.clusters(sigs, maxDist = 3)
        .orderBy(col("media_id"))
    }
  }

  val all: Seq[Q] = Seq(q15ScalarPack2, q16FirstPerGroup, q17UnionByName, q18MediaMeta,
    q19SessionWindow, q20CidrFilter, m1MediaPipeline, m2ImagePipeline, m3AudioPipeline,
    m4VideoPipeline, m5MjpegAviPipeline, m15Y4mPipeline, m6ImageNearDup, m7AudioNearDup, m8VideoNearDup,
    m9MediaDedup, m10MediaQuality, m11AudioQuality, m12MediaCurate, m13VideoQuality,
    m14MediaClusters, q44SaltedJoin, q45AsofJoin, q46RangeJoin, q47ZOrderLayout)
}
