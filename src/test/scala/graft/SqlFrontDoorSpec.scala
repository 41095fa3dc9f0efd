package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestBytes._
import graft.sources.SqlFrontDoor

/** SQL-only round trips through the TVF front door: every assertion uses
  * `spark.sql` exclusively — no DataFrame API — proving the protocol
  * surface is reachable from plain SQL (SURVEY NEXT #5).
  */
class SqlFrontDoorSpec extends AnyFunSuite {

  private def ber(tag: Int, value: Array[Byte]): Array[Byte] =
    cat(Array(tag.toByte, value.length.toByte), value)

  private lazy val spark = {
    SqlFrontDoor.register(SparkTest.spark)
    SparkTest.spark
  }

  test("scalar functions from pure SQL") {
    val r = spark.sql(
      """SELECT tbcd_decode(unhex('2143f5')) AS t,
        |       bcd_swap(unhex('2143f5')) AS b,
        |       fvec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d""".stripMargin)
      .collect().head
    assert(r.getString(0) == "12345")
    assert(r.getString(1) == "12345")
    assert(r.getDouble(2) == 9.0)
  }

  test("pcap_frames + diameter_records TVFs round-trip a capture") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    val pcap = pcapFile(Seq(
      (1000L, 0, ether(ipv4(132, a, b, sctpData(3868, 3868, 1, 1, 46L,
        diameterMsg(request = true, 316, 9, 9, strAvp(263, "sess-1")))))),
      (1001L, 0, ether(ipv4(132, b, a, sctpData(3868, 3868, 1, 1, 46L,
        diameterMsg(request = false, 316, 9, 9, strAvp(263, "sess-1"),
          u32Avp(268, 2001))))))))
    val dir = Files.createTempDirectory("graftsqlfd")
    Files.write(dir.resolve("d.pcap"), pcap)
    val p = dir.toString + "/*.pcap"

    assert(spark.sql(s"SELECT count(*) FROM pcap_frames('$p')").collect().head.getLong(0) == 2L)
    // chunked variant: same frames, offset-valued frameNo (first = 24)
    val ch = spark.sql(
      s"SELECT frameNo, md5(data) AS h FROM pcap_frames_chunked('$p', '65536') ORDER BY frameNo")
      .collect()
    val pl = spark.sql(
      s"SELECT md5(data) AS h FROM pcap_frames('$p') ORDER BY frameNo").collect()
    assert(ch.length == 2 && ch.head.getLong(0) == 24L)
    assert(ch.map(_.getString(1)).toSeq == pl.map(_.getString(0)).toSeq)

    val rows = spark.sql(
      s"""SELECT sessionId, request, resultCode
         |FROM diameter_records('$p')
         |ORDER BY request DESC""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows(0).getBoolean(1) && rows(0).getString(0) == "sess-1")
    assert(!rows(1).getBoolean(1) && rows(1).getLong(2) == 2001L)
  }

  test("tcap_transactions TVF sessionizes from pure SQL") {
    val begin = ber(0x62, cat(ber(0x48, Array[Byte](0x11, 0x22)),
      ber(0x6c, ber(0xa1, cat(ber(0x02, Array[Byte](1)), ber(0x02, Array[Byte](45)))))))
    val end = ber(0x64, ber(0x49, Array[Byte](0x11, 0x22)))
    val f1 = mtp3(77, 88, sccpUdt(
      sccpAddrGt(6, Array(0x65, 0x87).map(_.toByte)),
      sccpAddrGt(8, Array(0x21, 0x43).map(_.toByte)), begin))
    val f2 = mtp3(88, 77, sccpUdt(
      sccpAddrGt(8, Array(0x21, 0x43).map(_.toByte)),
      sccpAddrGt(6, Array(0x65, 0x87).map(_.toByte)), end))
    val dir = Files.createTempDirectory("graftsqltcap")
    Files.write(dir.resolve("t.pcapng"),
      pcapngFile(141, Seq((100L * 1000000L, f1), (101L * 1000000L, f2))))
    val rows = spark.sql(
      s"SELECT key, frames_list FROM tcap_transactions('${dir.toString}/*.pcapng')")
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "8_1234_" + 0x1122)
    assert(rows.head.getString(1) == "1 2")
  }

  test("http_records TVF: request-response linking from pure SQL") {
    val client = Array[Byte](10, 0, 0, 1)
    val server = Array[Byte](10, 0, 0, 2)
    def frame(src: Array[Byte], dst: Array[Byte], sp: Int, dp: Int, seq: Long,
        ack: Long, text: String) =
      ether(ipv4(6, src, dst, tcp(sp, dp, seq, ack, 24, text.getBytes("UTF-8"))))
    val pcap = pcapFile(Seq(
      (100L, 1, frame(client, server, 1111, 80, 1, 1, "GET /a HTTP/1.1\r\n\r\n")),
      (100L, 2, frame(server, client, 80, 1111, 1, 2, "HTTP/1.1 200 OK\r\n\r\n"))))
    val dir = Files.createTempDirectory("graftsqlhttp")
    Files.write(dir.resolve("h.pcap"), pcap)
    val rows = spark.sql(
      s"""SELECT method, http_response_in FROM http_records('${dir.toString}/*.pcap')
         |WHERE httpIsRequest""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "GET")
    assert(rows.head.getLong(1) == 2L)
  }

  test("GraftExtensions: an extensions-built session gets the whole surface") {
    val base = SparkTest.spark
    // what spark.sql.extensions=graft.sources.GraftExtensions produces
    // at session build (static conf — cannot be flipped on a live
    // context, so the session is constructed with the extensions applied)
    val s2 = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      base, new graft.sources.GraftExtensions()(_))
    try {
      assert(s2 ne base)
      assert(s2.sql("SELECT tbcd_decode(unhex('2143f5')) AS t").collect()
        .head.getString(0) == "12345")
      val a = Array[Byte](10, 0, 0, 9)
      val b = Array[Byte](10, 0, 0, 8)
      val pcap = pcapFile(Seq(
        (1000L, 0, ether(ipv4(132, a, b, sctpData(3868, 3868, 1, 1, 46L,
          diameterMsg(request = true, 316, 5, 5, strAvp(263, "ext-1"))))))))
      val dir = Files.createTempDirectory("graftsqlext")
      Files.write(dir.resolve("d.pcap"), pcap)
      val rows = s2.sql(
        s"SELECT sessionId FROM diameter_records('${dir.toString}/*.pcap')").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("ext-1"))
      // the base session is untouched by the injection
      intercept[org.apache.spark.sql.AnalysisException] {
        base.newSession().sql("SELECT tbcd_decode(unhex('21'))").collect()
      }
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("TVF composes with aggregation and pruning in one SQL statement") {
    val a = Array[Byte](10, 0, 0, 1)
    val b = Array[Byte](10, 0, 0, 2)
    val frames = (1 to 4).map { i =>
      (1000L + i, 0, ether(ipv4(132, a, b, sctpData(3868, 3868, 1, i, 46L,
        diameterMsg(request = i % 2 == 1, 316, i, i, strAvp(263, s"s${i / 2}"))))))
    }
    val dir = Files.createTempDirectory("graftsqlagg")
    Files.write(dir.resolve("d.pcap"), pcapFile(frames))
    val rows = spark.sql(
      s"""SELECT sessionId, count(*) AS n
         |FROM diameter_records('${dir.toString}/*.pcap')
         |GROUP BY sessionId ORDER BY sessionId""".stripMargin).collect()
    // i=1→s0(req), i=2,3→s1, i=4→s2: grouped counts prove the TVF scan,
    // the aggregation, and the ORDER BY all composed in one statement
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("s0", 1L), ("s1", 2L), ("s2", 1L)))
  }

  test("dedup-family TVFs match the DataFrame API from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    // minhash near-dup pairs: SQL TVF result == operator result
    val sqlPairs = spark.sql(
      s"SELECT da, db FROM minhash_pairs('$docs') ORDER BY da, db")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val apiPairs = graft.operators.Dedup
      .minhashLshPairs(spark.read.parquet(docs), "doc_id", "text", 3, 4, 4, 0.5)
      .orderBy("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sqlPairs.toSeq == apiPairs.toSeq)
    // exact dedup groups compose with SQL aggregation in one statement
    val nDocs = spark.read.parquet(docs).count()
    val total = spark.sql(
      s"SELECT CAST(sum(n_copies) AS BIGINT) AS n FROM doc_dedup_groups('$docs')")
      .collect().head.getLong(0)
    assert(total == nDocs, "every document must belong to exactly one group")
  }

  test("dup_clusters and running_total TVFs match the DataFrame API") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val sqlClusters = spark.sql(
      s"SELECT doc_id, cluster, keeper_doc_id FROM dup_clusters('$docs') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val apiClusters = graft.operators.Components
      .dupClusters(spark.read.parquet(docs), "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sqlClusters.toSeq == apiClusters.toSeq)
    assert(sqlClusters.forall { case (_, _, keeper) => keeper >= 0 })
    // running_total over doc_id: final row's total == corpus sum
    val last = spark.sql(
      s"""SELECT running_total FROM running_total('$docs', 'doc_id', 'doc_id')
         |ORDER BY doc_id DESC LIMIT 1""".stripMargin).collect().head.getLong(0)
    val n = spark.read.parquet(docs).count()
    assert(last == n * (n - 1) / 2, "running total of 0..n-1 must be n(n-1)/2")
    // generic connected_components over an edge parquet: two known
    // components, min-labelled
    val edgeDir = java.nio.file.Files.createTempDirectory("graftedges").toString
    import spark.implicits._
    Seq((2L, 1L), (2L, 3L), (11L, 10L), (3L, 1L))
      .toDF("src", "dst").write.mode("overwrite").parquet(edgeDir)
    val comps = spark.sql(
      s"SELECT node, component FROM connected_components('$edgeDir', 'src', 'dst') ORDER BY node")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("corpus-curation TVFs (span_dedup, bm25, lm, split, shard) from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    // span_dedup == operator output
    val sqlSpans = spark.sql(
      s"SELECT doc_id, span_start, span_end FROM span_dedup('$docs') ORDER BY doc_id, span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val apiSpans = graft.operators.SpanDedup
      .dupSpans(spark.read.parquet(docs), "doc_id", "text", 8)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sqlSpans.toSeq == apiSpans.toSeq && sqlSpans.nonEmpty)
    // bm25_topk composes with a WHERE from SQL; k is a string TVF arg
    val hits = spark.sql(
      s"SELECT doc_id, score FROM bm25_topk('$docs', 'spark,join,window', '5') WHERE score > 0")
      .collect()
    assert(hits.length <= 5 && hits.nonEmpty)
    // bigram_lm_scores: every scored doc has n_bigrams >= 1 and a mean
    // within the fixed-point probability range (0, SCALE]
    val lmBad = spark.sql(
      s"""SELECT count(*) AS bad FROM bigram_lm_scores('$docs')
         |WHERE n_bigrams < 1 OR lm_mean <= 0 OR lm_mean > ${graft.operators.BigramLm.Scale}""".stripMargin)
      .collect().head.getLong(0)
    assert(lmBad == 0L)
    // leak_free_split: one split per cluster, asserted in SQL
    val leaky = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT cluster FROM leak_free_split('$docs')
         |  GROUP BY cluster HAVING count(DISTINCT split) > 1)""".stripMargin)
      .collect().head.getLong(0)
    assert(leaky == 0L)
    // cross_dedup with the same corpus on both sides must reproduce
    // minhash_pairs exactly when restricted to da < db (the symmetric
    // kernel's canonical orientation)
    val crossPairs = spark.sql(
      s"SELECT da, db FROM cross_dedup('$docs', '$docs') WHERE da < db ORDER BY da, db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val symPairs = spark.sql(
      s"SELECT da, db FROM minhash_pairs('$docs') ORDER BY da, db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(crossPairs == symPairs && crossPairs.nonEmpty)
    // overlapping corpora: a doc on both sides is not a dup of itself
    val selfPairs = spark.sql(
      s"SELECT count(*) FROM cross_dedup('$docs', '$docs') WHERE da = db")
      .collect().head.getLong(0)
    assert(selfPairs == 0L)
    // the indexed serve path from SQL: CTAS the standing corpus's
    // minhash index to parquet, then the probe-only gate must
    // reproduce the recompute-both-sides kernel exactly
    val idxDir = java.nio.file.Files.createTempDirectory("graft_sql_idx").toString
    spark.sql(s"SELECT * FROM minhash_doc_index('$docs')")
      .write.mode("overwrite").parquet(idxDir)
    val servedPairs = spark.sql(
      s"SELECT da, db FROM cross_dedup_indexed('$docs', '$idxDir') WHERE da < db ORDER BY da, db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(servedPairs == crossPairs)
    // temp_sample: the boosted smallest source keeps a higher fraction
    // than the damped largest source
    val fracs = spark.sql(
      s"""SELECT k.source, CAST(count(*) AS DOUBLE) / max(tot) AS frac
         |FROM temp_sample('$docs', '2', '5') k
         |JOIN (SELECT source, count(*) AS tot FROM parquet.`$docs` GROUP BY source) t
         |  ON k.source = t.source
         |GROUP BY k.source""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fracs.nonEmpty && fracs.values.forall(f => f > 0.0 && f <= 1.0))
    // bpe_top_pairs: matches the operator output, k honored
    val sqlBpe = spark.sql(
      s"SELECT a, b, cnt FROM bpe_top_pairs('$docs', '5')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val apiBpe = graft.operators.Bpe.topPairs(spark.read.parquet(docs), "text", 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(sqlBpe == apiBpe && sqlBpe.length == 5)
    // ppl_buckets: every scored doc gets a tier in [0, 3), tiers are
    // equal-population within one doc
    val tiers = spark.sql(
      s"""SELECT bucket, count(*) AS c FROM ppl_buckets('$docs', '3')
         |GROUP BY bucket ORDER BY bucket""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(tiers.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(tiers.map(_._2).max - tiers.map(_._2).min <= 1,
      s"tiers must be equal-population: ${tiers.toSeq}")
    // ppl_thresholds: the k-1 gate cut points, ascending, and each cut
    // equals the min lm_mean of its batch bucket
    val cuts = spark.sql(
      s"SELECT bucket, cut FROM ppl_thresholds('$docs', '3') ORDER BY bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cuts.map(_._1).toSeq == Seq(1L, 2L))
    assert(cuts.map(_._2).sorted.sameElements(cuts.map(_._2)))
    val minByBucket = spark.sql(
      s"""SELECT bucket, min(lm_mean) AS m FROM ppl_buckets('$docs', '3')
         |WHERE bucket >= 1 GROUP BY bucket ORDER BY bucket""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cuts.toSeq == minByBucket.toSeq)
    // source_mix: no source exceeds its token budget
    val over = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT source, max(cum_tokens) AS mx FROM source_mix('$docs', '800')
         |  GROUP BY source HAVING mx > 800)""".stripMargin)
      .collect().head.getLong(0)
    assert(over == 0L)
    // shard_layout: positions within each shard are exactly 1..count
    val shardBad = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT shard, max(pos) AS mx, count(*) AS c, min(pos) AS mn
         |  FROM shard_layout('$docs', '8') GROUP BY shard
         |  HAVING mx != c OR mn != 1)""".stripMargin)
      .collect().head.getLong(0)
    assert(shardBad == 0L)
  }

  test("span_cut and ngram_decontam TVFs match the DataFrame API from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val sqlCut = spark.sql(
      s"SELECT doc_id, clean_text, n_cut_tokens FROM span_cut('$docs') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val apiCut = graft.operators.SpanDedup.cutSpans(spark.read.parquet(docs), "doc_id", "text", 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(sqlCut == apiCut && sqlCut.nonEmpty)
    // self-decontamination: every doc with >= 8 tokens shares all its
    // windows with itself, so the gate flags every such doc
    val selfHits = spark.sql(
      s"SELECT count(*) FROM ngram_decontam('$docs', '$docs')").collect().head.getLong(0)
    val longDocs = spark.sql(
      s"""SELECT count(*) FROM parquet.`$docs`
         |WHERE size(split(trim(text), '\\\\s+')) >= 8""".stripMargin)
      .collect().head.getLong(0)
    assert(selfHits == longDocs && selfHits > 0)
  }

  test("media near-dup TVFs (image/audio/video) run end-to-end from pure SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediatvf")
    // two identical images + one different
    val mk = (up: Boolean) => {
      val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 9).foreach(x => {
        val v = if (up) 40 + x * 11 + y * 7 else 160 - x * 11 - y * 7
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }))
      graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    }
    Seq((1L, mk(true)), (2L, mk(true)), (3L, mk(false))).toDF("img_id", "png")
      .write.parquet(s"$dir/imgs")
    val imgPairs = spark.sql(s"SELECT da, db, hamming FROM image_neardup('$dir/imgs', '0')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(imgPairs.toSeq === Seq((1L, 2L, 0L)))
    // two identical clips' WAVs + one different contour
    val wav = (up: Boolean) => {
      val s0 = Array.tabulate[Short](256)(t => (5000 + (if (up) t else -t) * 10).toShort)
      graft.multimodal.Multimodal.JvmAudioCodec.encodeWavS16Mono(s0, 8000)
    }
    Seq((1L, wav(true)), (2L, wav(true)), (3L, wav(false))).toDF("clip_id", "wav")
      .write.parquet(s"$dir/clips")
    val audPairs = spark.sql(s"SELECT da, db FROM audio_neardup('$dir/clips', '0')")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(audPairs.toSeq === Seq((1L, 2L)))
    // video: one AVI clip pair sharing a contour
    val avi = {
      val frames = (0 until 64).map { f =>
        val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val v = 100 + f
        (0 until 6).foreach(y => (0 until 8).foreach(x =>
          img.setRGB(x, y, (v << 16) | (v << 8) | v)))
        img
      }
      graft.multimodal.Multimodal.JvmAviCodec.encodeMjpegAvi(frames, 10)
    }
    Seq((1L, avi), (2L, avi)).toDF("clip_id", "avi").write.parquet(s"$dir/vids")
    val vidPairs = spark.sql(s"SELECT da, db FROM video_neardup('$dir/vids', '0')")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(vidPairs.toSeq === Seq((1L, 2L)))
  }

  test("media_dedup TVF: exact lane + perceptual lane verdicts from pure SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadeduptvf")
    val mk = (shade: Int) => {
      val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 9).foreach(x => {
        val v = shade + x * 11 + y * 7
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }))
      graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    }
    // 1 and 2 byte-identical; 3 same gradient shifted (same dHash, near
    // at ham 0 but different bytes); 4 reversed gradient (far)
    val rev = {
      val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 9).foreach(x => {
        val v = 200 - x * 11 - y * 7
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }))
      graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    }
    Seq((1L, mk(40)), (2L, mk(40)), (3L, mk(50)), (4L, rev)).toDF("img_id", "png")
      .write.parquet(s"$dir/imgs")
    val got = spark.sql(
      s"SELECT media_id, action, dup_of FROM media_dedup('$dir/imgs', '0') ORDER BY media_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === Seq((1L, "keep", -1L), (2L, "exact_dup", 1L),
      (3L, "near_dup", 1L), (4L, "keep", -1L)))
  }

  test("image_quality TVF gates from pure SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("imgqualtvf")
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val v = f(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      graft.multimodal.Multimodal.JvmImageCodec.encodePng(img)
    }
    Seq((1L, png(16, 16, (x, _) => 30 + x * 8)), (2L, png(16, 16, (_, _) => 90)))
      .toDF("img_id", "png").write.parquet(s"$dir/imgs")
    val got = spark.sql(
      s"SELECT media_id, keep, reasons FROM image_quality('$dir/imgs', '8', '8', '10', '4') ORDER BY media_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(got === Seq((1L, true, ""), (2L, false, "uniform")))
    // the composed chain from pure SQL: the uniform image gates out
    val curated = spark.sql(
      s"SELECT media_id, action FROM media_curate('$dir/imgs', '8', '8', '10', '4', '3') ORDER BY media_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(curated === Seq((1L, "keep"), (2L, "gated")))
  }

  test("cosine_neardup_exact carries the BASELINE warning; vec_neardup_lsh is the pointer target") {
    // the registration itself must label the O(N^2) scan — not only the
    // Scaladoc — so DESCRIBE FUNCTION warns before a user runs it
    val usage = SqlFrontDoor.tvfUsage("cosine_neardup_exact")
    assert(usage.contains("BASELINE, NOT SERVING"))
    assert(usage.contains("vec_neardup_lsh"))
    val injected = graft.sources.SqlFrontDoor.tableInjections
      .find(_._1.funcName == "cosine_neardup_exact")
    assert(injected.nonEmpty)
    assert(injected.get._2.getUsage.contains("BASELINE, NOT SERVING"))
    // both TVFs run from pure SQL and the baseline validates the serving
    // kernel: every LSH pair is an exact pair (same-bucket subset)
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val exact = spark.sql(
      s"SELECT da, db FROM cosine_neardup_exact('$emb', '0.2')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = spark.sql(
      s"SELECT da, db FROM vec_neardup_lsh('$emb', '0.2')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
  }

  test("warc_records / warc_text TVFs read a synthesized capture from pure SQL") {
    val body = "HTTP/1.1 200 OK\r\n\r\n<p>Hello &amp; <b>world</b></p>"
    val recBytes = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://t/1\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n").getBytes("UTF-8")
    val p = java.nio.file.Files.createTempDirectory("warctvf").resolve("t.warc")
    java.nio.file.Files.write(p, recBytes)
    val n = spark.sql(s"SELECT count(*) FROM warc_records('$p')").collect().head.getLong(0)
    assert(n === 1L)
    val text = spark.sql(s"SELECT text FROM warc_text('$p')").collect().head.getString(0)
    assert(text === "Hello & world")
  }

  test("dsir_select TVF matches the DataFrame API from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val sql = spark.sql(
      s"SELECT doc_id, w_mean, selected FROM dsir_select('$docs', '$docs') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val df = spark.read.parquet(docs)
    val api = graft.operators.Dsir.select(df, df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSeq
    assert(sql == api && sql.nonEmpty)
  }

  test("epoch_upsample TVF matches the DataFrame API from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val sql = spark.sql(
      s"SELECT doc_id, source, copy_no FROM epoch_upsample('$docs', 'src0:275,src1:0', '100') ORDER BY doc_id, copy_no")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val api = graft.operators.Layout.epochUpsample(spark.read.parquet(docs), "doc_id", "source",
      Map("src0" -> 275, "src1" -> 0), 100)
      .orderBy("doc_id", "copy_no")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(sql == api && sql.nonEmpty)
  }

  test("boilerplate TVF matches the DataFrame API from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val sql = spark.sql(
      s"SELECT doc_id, clean_text, n_chunks, n_dropped FROM boilerplate('$docs', '8', '3') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val api = graft.operators.Boilerplate.remove(spark.read.parquet(docs), "doc_id", "text", 8, 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(sql == api && sql.nonEmpty)
  }

  test("semdedup TVF matches the DataFrame API from pure SQL") {
    val embs = "/root/testdata/sf0.001/embeddings.parquet"
    val sql = spark.sql(
      s"SELECT vec_id, cluster_id, cent_cos, kept FROM semdedup('$embs', '8', '0.35') ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    val api = graft.operators.SemDedup.dedup(spark.read.parquet(embs), "vec_id", "embedding", 8, 0.35)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(sql == api && sql.nonEmpty)
  }

  test("as_of_join / range_join / zorder_key TVFs match the DataFrame API from pure SQL") {
    import SparkTest.spark.implicits._
    val dir = Files.createTempDirectory("graft_sql_joins")
    val factP = dir.resolve("fact").toString
    val dimP = dir.resolve("dim").toString
    Seq((1L, 10L), (1L, 25L), (2L, 5L), (2L, 40L))
      .toDF("k", "ts").write.mode("overwrite").parquet(factP)
    Seq((1L, 8L, 20L, "a"), (1L, 22L, 30L, "b"), (2L, 35L, 50L, "c"))
      .toDF("k", "lo", "hi", "tag").write.mode("overwrite").parquet(dimP)
    // range containment: fact ts within [lo, hi] per k
    val ranged = spark.sql(
      s"SELECT k, ts, tag FROM range_join('$factP', '$dimP', 'k', 'ts', 'lo', 'hi', '16') ORDER BY k, ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(ranged == Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 40L, "c")))
    // as-of: latest dim value at-or-before ts (dim keyed on lo here)
    val dimAsof = dir.resolve("dim_asof").toString
    Seq((1L, 8L, "a"), (1L, 22L, "b"), (2L, 35L, "c"))
      .toDF("k", "ts", "tag").write.mode("overwrite").parquet(dimAsof)
    val asof = spark.sql(
      s"SELECT k, ts, tag FROM as_of_join('$factP', '$dimAsof', 'k', 'ts', 'tag') ORDER BY k, ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(asof == Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, null), (2L, 40L, "c")))
    // zorder_key: matches the codegen'd interleave expression
    val z = spark.sql(
      s"SELECT k, ts, zkey FROM zorder_key('$factP', 'k', 'ts') ORDER BY k, ts")
      .collect().map(_.getLong(2)).toSeq
    val zApi = spark.read.parquet(factP)
      .select(graft.operators.ZOrder.interleave2(col("k"), col("ts")).as("z"),
        col("k"), col("ts"))
      .orderBy("k", "ts").collect().map(_.getLong(0)).toSeq
    assert(z == zApi)
  }

  test("curate TVF: the composed chain matches the DataFrame API from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val sqlRows = spark.sql(
      s"""SELECT doc_id, n_tokens, n_copies, split FROM curate('$docs')
         |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val apiRows = graft.queries.Text.curateChain(spark.read.parquet(docs))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(sqlRows == apiRows && sqlRows.nonEmpty)
    // the gate actually gates: kept set is a strict subset of the corpus
    val total = spark.sql(s"SELECT count(*) FROM parquet.`$docs`").collect().head.getLong(0)
    assert(sqlRows.length < total)
    assert(sqlRows.map(_._4).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("round-11 TVFs (bm25 batch/serve/gate, sketches, normalize, sq8) from pure SQL") {
    import spark.implicits._
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val dir = Files.createTempDirectory("graftsql11")
    val qP = dir.resolve("q").toString
    Seq((1L, "spark"), (1L, "join"), (2L, "window")).toDF("qid", "term")
      .write.mode("overwrite").parquet(qP)

    // batch topk == DataFrame API
    val sqlTop = spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_batch_topk('$docs', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    val apiTop = graft.operators.Bm25.batchTopK(spark.read.parquet(docs), "doc_id", "text",
        spark.read.parquet(qP), 5)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(sqlTop == apiTop && sqlTop.nonEmpty)

    // index build + serve == batch
    val idx = dir.resolve("bm25idx").toString
    assert(spark.sql(s"SELECT n FROM bm25_index('$docs', '$idx')")
      .collect().head.getLong(0) > 0)
    val served = spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_serve('$idx', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    assert(served == sqlTop)

    // takedown tick from SQL: delete half the corpus, serve == the
    // batch scorer over the remainder; profile matches a fresh build
    val delP = dir.resolve("del").toString
    val keptP = dir.resolve("kept").toString
    spark.read.parquet(docs).filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(delP)
    spark.read.parquet(docs).filter(col("doc_id") % 2 =!= 0)
      .write.mode("overwrite").parquet(keptP)
    // the reverse index mirrors the corpus before the delete...
    assert(spark.sql(s"SELECT count(*) FROM bm25_index_docmap('$idx')")
      .collect().head.getLong(0) == spark.read.parquet(docs).count())
    val nAfter = spark.sql(s"SELECT n FROM bm25_index_delete('$idx', '$delP')")
      .collect().head.getLong(0)
    assert(nAfter == spark.read.parquet(keptP).count())
    // ...and the deleted docs' rows consolidated out with the tick
    assert(spark.sql(s"SELECT count(*) FROM bm25_index_docmap('$idx')")
      .collect().head.getLong(0) == nAfter)
    assert(spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_serve('$idx', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq ==
      spark.sql(
        s"SELECT qid, doc_id, score, rank FROM bm25_batch_topk('$keptP', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq)
    assert(spark.sql(s"SELECT * FROM bm25_index_profile('$idx')")
      .collect().head.toSeq.head == nAfter)

    // decontamination gate: scoring the corpus against its own queries
    // emits a hit for every (doc, query) sharing an unpruned term
    val hits = spark.sql(
      s"SELECT count(*) FROM bm25_decontam_gate('$docs', '$qP', '$docs', '0')")
      .collect().head.getLong(0)
    assert(hits > 0)

    // sketches: CMS overestimate nonneg, HLL registers complete
    val cms = spark.sql(s"SELECT min(overestimate) FROM cms_counts('$docs', '4', '16')")
      .collect().head.getLong(0)
    assert(cms >= 0L)
    assert(spark.sql(s"SELECT count(*) FROM hll_distinct('$docs')")
      .collect().head.getLong(0) == 16L)

    // normalize: idempotent and whitespace-collapsed
    val norm = spark.sql(
      s"SELECT count(*) FROM text_normalize('$docs') WHERE text RLIKE '\\\\s\\\\s'")
      .collect().head.getLong(0)
    assert(norm == 0L)

    // sq8: same contract as the other knn TVFs
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val cP = dir.resolve("c").toString
    val qvP = dir.resolve("qv").toString
    spark.read.parquet(emb).selectExpr("vec_id AS cid", "embedding AS cvec")
      .write.mode("overwrite").parquet(cP)
    spark.read.parquet(emb).filter(col("vec_id") < 3)
      .selectExpr("vec_id AS qid", "embedding AS qvec")
      .write.mode("overwrite").parquet(qvP)
    val sq = spark.sql(s"SELECT qid, rank, cid FROM knn_sq8('$cP', '$qvP', '5') ORDER BY qid, rank")
      .collect()
    assert(sq.length == 15)
  }

  test("ivf_index_build/append/serve TVFs run the committed lifecycle from pure SQL") {
    import spark.implicits._
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val dir = Files.createTempDirectory("graftsqlivf")
    val idx = dir.resolve("ivfidx").toString
    // caller-trained centroid artifact: 4 deterministic cells
    val dim = spark.read.parquet(emb)
      .select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val cents = Array.tabulate(4)(c => Array.tabulate(dim)(j =>
      (((c * 31 + j * 17) % 13) - 6).toFloat / 3f))
    val centP = dir.resolve("cents").toString
    cents.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "cvec").write.mode("overwrite").parquet(centP)
    val corpP = dir.resolve("corp").toString
    spark.read.parquet(emb).filter(col("vec_id") >= 20)
      .selectExpr("vec_id AS cid", "embedding AS cvec")
      .write.mode("overwrite").parquet(corpP)
    val batchP = dir.resolve("batch").toString
    spark.read.parquet(emb).filter(col("vec_id") >= 5 && col("vec_id") < 20)
      .selectExpr("vec_id AS cid", "embedding AS cvec")
      .write.mode("overwrite").parquet(batchP)
    val qP = dir.resolve("qv").toString
    spark.read.parquet(emb).filter(col("vec_id") < 5)
      .selectExpr("vec_id AS qid", "embedding AS qvec")
      .write.mode("overwrite").parquet(qP)

    val built = spark.sql(
      s"SELECT * FROM ivf_index_build('$corpP', '$idx', '$centP')").collect().head
    assert(built.getLong(0) == 1L && built.getInt(1) == 4)
    val appended = spark.sql(
      s"SELECT * FROM ivf_index_append('$idx', '$batchP')").collect().head
    assert(appended.getLong(0) == 2L, "append must commit version 2")
    assert(appended.getLong(2) == 1L, "centroids stay at the build version")

    val sqlServe = spark.sql(
      s"SELECT qid, rank, cid FROM ivf_serve('$idx', '$qP', '5', '2') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    val apiServe = graft.operators.Ann.ivfServedTopK(spark, idx,
        spark.read.parquet(qP), 5, 2)
      .select(col("qid"), col("rank"), col("cid"))
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(sqlServe == apiServe && sqlServe.nonEmpty)
    // the appended batch is retrievable through SQL serving
    assert(sqlServe.exists { r =>
      val id = r(2).asInstanceOf[Long]; id >= 5L && id < 20L })
    // the rebuild alarm from SQL: one drift row per contributing
    // data version (build + append), matching the operator
    assert(spark.sql(s"SELECT * FROM ivf_index_drift('$idx') ORDER BY version")
      .collect().map(_.toSeq).toSeq ==
      graft.operators.Ann.ivfGeometryDrift(spark, idx)
        .collect().map(_.toSeq).toSeq)
    // the reverse map from SQL: one row per committed member
    assert(spark.sql(s"SELECT count(*) FROM ivf_index_cidmap('$idx')")
      .collect().head.getLong(0) ==
      graft.operators.Ann.readIvfCells(spark, idx).count())
    // vacuum from SQL: pure appends supersede no cells — at most v1's
    // re-owned reverse-map cbuckets retire through the artifact pass
    assert(spark.sql(s"SELECT * FROM ivf_index_vacuum('$idx', '0')")
      .collect().map(_.getLong(0)).forall(_ == 1L))
    // rebuild retires the history; vacuum then reports the dead versions
    assert(spark.sql(
      s"SELECT * FROM ivf_index_build('$corpP', '$idx', '$centP')")
      .collect().head.getLong(0) == 3L)
    assert(spark.sql(s"SELECT * FROM ivf_index_vacuum('$idx', '0')")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // the takedown tick from SQL: a delete batch commits its own
    // version and its cids are gone from the committed cells
    assert(spark.sql(s"SELECT * FROM ivf_index_delete('$idx', '$batchP')")
      .collect().head.getLong(0) == 4L, "delete must commit version 4")
    assert(graft.operators.Ann.readIvfCells(spark, idx)
      .filter(col("cid") >= 5 && col("cid") < 20).count() == 0L,
      "deleted cids must be gone from the committed cells")
  }

  test("hybrid_served TVF: both standing indexes built and fused from pure SQL == hybrid_rrf") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftsqlhsrv")
    val corpus = (100 until 140).map { i =>
      val words = Vector("apple", "banana", "cherry", "date", "fig", "grape")
      (i.toLong, s"${words(i % 6)} ${words((i / 2) % 6)} ${words((i * 3 + 1) % 6)}",
        Seq.tabulate(8)(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 3f))
    }
    val corpP = dir.resolve("corp").toString
    corpus.toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(corpP)
    val qP = dir.resolve("q").toString
    Seq((1L, "apple", corpus(3)._3), (1L, "fig", corpus(3)._3),
        (2L, "cherry", corpus(8)._3))
      .toDF("qid", "term", "qvec").write.mode("overwrite").parquet(qP)
    val bm25Idx = dir.resolve("bm25idx").toString
    val ivfIdx = dir.resolve("ivfidx").toString
    val centP = dir.resolve("cent").toString
    // 4 trained cells persisted as the centroid artifact
    (0 until 4).map(c => (c,
        Seq.tabulate(8)(j => (((c * 7 + 1) * 31 + j * 17) % 13 - 6).toFloat / 3f)))
      .toDF("cell", "cvec").write.mode("overwrite").parquet(centP)
    val vecsP = dir.resolve("vecs").toString
    corpus.map(c => (c._1, c._3)).toDF("cid", "cvec")
      .write.mode("overwrite").parquet(vecsP)
    spark.sql(s"SELECT * FROM bm25_index('$corpP', '$bm25Idx')").collect()
    spark.sql(s"SELECT * FROM ivf_index_build('$vecsP', '$ivfIdx', '$centP')")
      .collect()

    val sql = spark.sql(
      s"SELECT qid, doc_id, rrf, rank FROM hybrid_served(" +
        s"'$bm25Idx', '$ivfIdx', '$qP', '5', '5', '4') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    val api = graft.operators.Hybrid.servedTopK(spark, bm25Idx, ivfIdx,
        spark.read.parquet(qP), 5, 5, 4)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(sql == api && sql.nonEmpty)
    // nprobe covers every cell → equals the correctness-baseline TVF
    val baseline = spark.sql(
      s"SELECT qid, doc_id, rrf, rank FROM hybrid_rrf('$corpP', '$qP', '5', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    assert(sql == baseline)
  }

  test("hybrid_snapshot TVF equals hybrid_rrf on the same corpus from pure SQL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftsqlhyb")
    val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val o = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val corpP = dir.resolve("corp").toString
    Seq(
      (0L, "alpha beta gamma delta", v),
      (1L, "alpha beta gamma delta", v),
      (2L, "alpha beta gamma delta", o),
      (3L, "junk words only here", v),
      (4L, "other filler text here", o))
      .toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(corpP)
    val qP = dir.resolve("q").toString
    Seq((0L, "alpha", v), (0L, "gamma", v), (3L, "junk", v))
      .toDF("qid", "term", "qvec")
      .write.mode("overwrite").parquet(qP)
    val snap = spark.sql(
      s"SELECT qid, docId, rrf, rank FROM hybrid_snapshot('$corpP', '$qP', '$corpP', '3', '4') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    val fused = spark.sql(
      s"SELECT qid, doc_id, rrf, rank FROM hybrid_rrf('$corpP', '$qP', '3', '4') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    assert(snap == fused && snap.nonEmpty)
  }

  test("profiling TVFs (heavy_hitters, quantile_profile, random_projection) from pure SQL") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val emb = "/root/testdata/sf0.001/embeddings.parquet"

    // heavy hitters == the exact definition computed in plain SQL
    val hh = spark.sql(
      s"SELECT term, cnt FROM heavy_hitters('$docs', '150') ORDER BY term")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val brute = spark.sql(
      s"""WITH tok AS (SELECT explode(split(trim(text), '\\\\s+')) AS t
         |            FROM parquet.`$docs`),
         |tot AS (SELECT count(*) AS n FROM tok)
         |SELECT t AS term, count(*) AS cnt FROM tok, tot
         |GROUP BY t, n HAVING count(*) * 150 > n ORDER BY term""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hh == brute && hh.nonEmpty)

    // quantiles are monotone in pct and land inside the observed range
    val q = spark.sql(
      s"SELECT pct, value FROM quantile_profile('$docs', '10,50,90') ORDER BY pct")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(q.map(_._1) == Seq(10, 50, 90))
    assert(q.map(_._2) == q.map(_._2).sorted)

    // random projection: out_dim rows per vector, values finite
    val rp = spark.sql(
      s"SELECT count(*), count(DISTINCT dim), max(abs(value)) FROM random_projection('$emb', '8')")
      .collect().head
    val nVec = spark.read.parquet(emb).count()
    assert(rp.getLong(0) == nVec * 8 && rp.getLong(1) == 8L)
    assert(!rp.getDouble(2).isNaN && !rp.getDouble(2).isInfinite)
  }

  test("hybrid_rrf and cluster_sample TVFs match the DataFrame API from pure SQL") {
    import org.apache.spark.sql.functions.{col, element_at, explode, array, split, trim}
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val dir = Files.createTempDirectory("graftsqlhyb")

    // corpus = docs ∩ embeddings; queries = 3 docs' terms + vectors
    val corpusDf = spark.read.parquet(docs)
      .join(spark.read.parquet(emb),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    val corpusP = dir.resolve("corpus").toString
    corpusDf.write.mode("overwrite").parquet(corpusP)
    val w = split(trim(col("text")), "\\s+")
    val queriesDf = corpusDf.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("embedding").as("qvec"),
        explode(array(element_at(w, 1), element_at(w, 4))).as("term"))
    val queriesP = dir.resolve("queries").toString
    queriesDf.write.mode("overwrite").parquet(queriesP)

    val sqlH = spark.sql(
      s"SELECT qid, doc_id, rrf, rank FROM hybrid_rrf('$corpusP', '$queriesP', '8', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    val apiH = graft.operators.Hybrid.hybridTopK(
        spark.read.parquet(corpusP), "doc_id", "text", "embedding",
        spark.read.parquet(queriesP), 8, 5)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(sqlH == apiH && sqlH.nonEmpty)

    val sqlC = spark.sql(
      s"SELECT vec_id, cluster_id, cluster_rank, selected FROM cluster_sample('$emb', '8', '10') ORDER BY vec_id")
      .collect().map(_.toSeq).toSeq
    val apiC = graft.operators.SemDedup.clusterSample(
        spark.read.parquet(emb), "vec_id", "embedding", 8, 10)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(sqlC == apiC && sqlC.nonEmpty)
  }

  test("column_quantiles / column_histogram TVFs profile an arbitrary column from pure SQL") {
    val li = "/root/testdata/sf0.001/lineitem.parquet"
    val q = spark.sql(
      s"SELECT pct, value FROM column_quantiles('$li', 'l_quantity', '25,50,75') ORDER BY pct")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(q.map(_._1) == Seq(25, 50, 75) && q.map(_._2) == q.map(_._2).sorted)
    // histogram totals the table; quantiles land on observed values
    val h = spark.sql(s"SELECT sum(c), count(*) FROM column_histogram('$li', 'l_quantity')")
      .collect().head
    assert(h.getLong(0) == spark.read.parquet(li).count())
    assert(q.forall { case (_, v) => v >= 1 && v <= 50 })
  }

  test("warc_media TVF routes binary image responses by content type from pure SQL") {
    val dir = Files.createTempDirectory("graftwarcmedia")
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0xFF.toByte, '\r', '\n', '\r', '\n', 0x01)
    def rec(uri: String, ctype: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n").getBytes("UTF-8") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:$uri>\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
        http ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val cap = rec("http://x/a.png", "image/png", png) ++
      rec("http://x/b.html", "text/html", "<html></html>".getBytes("UTF-8"))
    val path = dir.resolve("m.warc")
    Files.write(path, cap)
    val rows = spark.sql(
      s"SELECT target_uri, payload FROM warc_media('$path', 'image/')").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "http://x/a.png")
    assert(rows.head.getAs[Array[Byte]](1).toSeq == png.toSeq)
  }

  test("committed minhash-index lifecycle from pure SQL") {
    val dir = Files.createTempDirectory("graftsqlmh")
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val refP = dir.resolve("ref").toString
    val batchP = dir.resolve("batch").toString
    spark.read.parquet(docs).filter(col("doc_id") % 5 =!= 0)
      .write.mode("overwrite").parquet(refP)
    spark.read.parquet(docs).filter(col("doc_id") % 5 === 0)
      .write.mode("overwrite").parquet(batchP)
    val idx = dir.resolve("mhidx").toString
    // build: the signature scheme rides the manifest receipt
    val receipt = spark.sql(
      s"SELECT * FROM minhash_index_build('$refP', '$idx', '3:4:4')")
      .collect().head
    assert(receipt.getAs[Long]("version") == 1L &&
      receipt.getAs[Int]("n") == 3 && receipt.getAs[Int]("bands") == 4)
    // gate from the committed rows == the recompute-both-sides kernel
    val gateSql =
      s"SELECT da, db, jaccard FROM minhash_index_gate('$idx', '$batchP', '0.5') ORDER BY da, db"
    val direct = spark.sql(
      s"SELECT da, db, jaccard FROM cross_dedup('$batchP', '$refP') ORDER BY da, db")
      .collect().map(_.toSeq).toSeq
    assert(spark.sql(gateSql).collect().map(_.toSeq).toSeq == direct &&
      direct.nonEmpty)
    // one committed admission tick: near-dups rejected, the rest appended
    val dec = spark.sql(
      s"SELECT * FROM minhash_index_admit('$idx', '$batchP', '0.5')").collect()
    val flagged = direct.map(_.head).toSet
    assert(dec.nonEmpty && dec.forall(r =>
      r.getAs[Boolean]("admitted") == !flagged.contains(r.getAs[Long]("sid"))))
    // id-only takedown of the admitted batch: gate == the original index
    val idsP = dir.resolve("ids").toString
    spark.read.parquet(batchP).selectExpr("doc_id AS sid")
      .write.mode("overwrite").parquet(idsP)
    val after = spark.sql(
      s"SELECT * FROM minhash_index_delete_ids('$idx', '$idsP')").collect().head
    assert(after.getAs[Long]("version") == 3L)
    assert(spark.sql(gateSql).collect().map(_.toSeq).toSeq == direct)
    // the consolidated admission history vacuums away
    assert(spark.sql(s"SELECT count(*) FROM minhash_index_vacuum('$idx', '0')")
      .collect().head.getLong(0) >= 1L)
    assert(spark.sql(gateSql).collect().map(_.toSeq).toSeq == direct)
  }

  test("upsert and compact TVFs run the refresh and maintenance verbs from pure SQL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftsqlups")
    // BM25: build, refresh one doc + insert one, compare to the rebuild
    val corp = Seq((1L, "apple banana cherry"), (2L, "banana date fig"),
      (3L, "cherry grape melon")).toDF("doc_id", "text")
    val corpP = dir.resolve("corp").toString
    corp.write.mode("overwrite").parquet(corpP)
    val upsP = dir.resolve("ups").toString
    Seq((2L, "papaya quince"), (9L, "durian rambutan banana"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(upsP)
    val idx = dir.resolve("bm25idx").toString
    spark.sql(s"SELECT * FROM bm25_index('$corpP', '$idx')").collect()
    val stats = spark.sql(
      s"SELECT n, sdl FROM bm25_index_upsert('$idx', '$upsP')").collect().head
    assert(stats.getLong(0) == 4L, "3 docs − 1 replaced + 2 batch = 4")
    val modP = dir.resolve("mod").toString
    Seq((1L, "apple banana cherry"), (3L, "cherry grape melon"),
      (2L, "papaya quince"), (9L, "durian rambutan banana"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(modP)
    val qP = dir.resolve("q").toString
    Seq((1L, "banana"), (2L, "papaya"), (3L, "durian"))
      .toDF("qid", "term").write.mode("overwrite").parquet(qP)
    assert(spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_serve('$idx', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq ==
      spark.sql(
        s"SELECT qid, doc_id, score, rank FROM bm25_batch_topk('$modP', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq, "upsert == rebuild, served from SQL")

    // IVF: build, append (fragmenting), compact from SQL, then upsert
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f)))
    val centP = dir.resolve("cent").toString
    cents.toDF("cell", "cvec").write.mode("overwrite").parquet(centP)
    val v1P = dir.resolve("v1").toString
    Seq((10L, Seq(0.9f, 0.1f)), (11L, Seq(0.1f, 0.9f)))
      .toDF("cid", "cvec").write.mode("overwrite").parquet(v1P)
    val v2P = dir.resolve("v2").toString
    Seq((12L, Seq(0.8f, 0.2f))).toDF("cid", "cvec")
      .write.mode("overwrite").parquet(v2P)
    val ivfIdx = dir.resolve("ivfidx").toString
    spark.sql(s"SELECT * FROM ivf_index_build('$v1P', '$ivfIdx', '$centP')").collect()
    spark.sql(s"SELECT * FROM ivf_index_append('$ivfIdx', '$v2P')").collect()
    assert(spark.sql(s"SELECT * FROM ivf_index_compact('$ivfIdx', '2')")
      .collect().map(_.getInt(0)).toSeq == Seq(0),
      "cell 0 holds two versions (build + append) and must compact")
    val upsVP = dir.resolve("upsv").toString
    Seq((10L, Seq(0.2f, 0.8f)), (13L, Seq(0.7f, 0.3f))).toDF("cid", "cvec")
      .write.mode("overwrite").parquet(upsVP)
    spark.sql(s"SELECT * FROM ivf_index_upsert('$ivfIdx', '$upsVP')").collect()
    val cells = graft.operators.Ann.readIvfCells(spark, ivfIdx).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(cells == Map(10L -> 1, 11L -> 1, 12L -> 0, 13L -> 0),
      "10 moved cells, 13 inserted, others untouched")

    // minhash: the refresh verb from SQL bumps the committed version
    // and replaces the id's rows (parity is IndexUpsertSpec's job)
    val mhIdx = dir.resolve("mhidx").toString
    val mhP = dir.resolve("mh").toString
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(mhP)
    spark.sql(s"SELECT * FROM minhash_index_build('$mhP', '$mhIdx', '3:4:2')").collect()
    val mhUpsP = dir.resolve("mhups").toString
    Seq((1L, "an entirely rewritten document with brand new content"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(mhUpsP)
    val rec = spark.sql(
      s"SELECT * FROM minhash_index_upsert('$mhIdx', '$mhUpsP')").collect().head
    assert(rec.getAs[Long]("version") == 2L)
    assert(graft.operators.MinhashIndex.readRows(spark, mhIdx)
      .filter(col("sid") === 1L).count() > 0L)
  }

  test("time-travel TVFs: *_serve_version and index_history from pure SQL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftsqltt")
    val corpP = dir.resolve("corp").toString
    Seq((1L, "apple banana cherry"), (2L, "banana date fig"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(corpP)
    val addP = dir.resolve("add").toString
    Seq((9L, "banana papaya quince")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(addP)
    val qP = dir.resolve("q").toString
    Seq((1L, "banana")).toDF("qid", "term")
      .write.mode("overwrite").parquet(qP)
    val idx = dir.resolve("idx").toString
    spark.sql(s"SELECT * FROM bm25_index('$corpP', '$idx')").collect()
    val atV1 = spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_serve('$idx', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    spark.sql(s"SELECT * FROM bm25_index_append('$idx', '$addP')").collect()
    assert(spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_serve_version('$idx', '1', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq == atV1,
      "version 1 serves what it served when it was CURRENT")
    assert(spark.sql(s"SELECT * FROM index_history('$idx') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq ==
      Seq((1L, true, false), (2L, true, true)))
  }

  test("export TVFs deep-clone the committed indexes from pure SQL") {
    val dir = Files.createTempDirectory("graftsqlexp")
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val corpP = dir.resolve("corp").toString
    spark.read.parquet(docs).selectExpr("doc_id", "text")
      .write.mode("overwrite").parquet(corpP)
    val idx = dir.resolve("bm25").toString
    spark.sql(s"SELECT * FROM bm25_index('$corpP', '$idx')").collect()
    val qP = dir.resolve("q").toString
    spark.sql(s"""SELECT doc_id AS qid, split(trim(text), '\\\\s+')[1] AS term
                 |FROM parquet.`$corpP` WHERE doc_id % 40 = 3""".stripMargin)
      .write.mode("overwrite").parquet(qP)
    // export CURRENT, serve from the clone — identical rows
    val clone = dir.resolve("bm25clone").toString
    assert(spark.sql(
      s"SELECT * FROM bm25_index_export('$idx', '$clone')")
      .collect().head.getLong(0) == 1L)
    val serve = (d: String) => spark.sql(
      s"SELECT qid, doc_id, score, rank FROM bm25_serve('$d', '$qP', '5') ORDER BY qid, rank")
      .collect().map(_.toSeq).toSeq
    assert(serve(clone) == serve(idx) && serve(idx).nonEmpty)
    // the versioned form refuses an uncommitted version, loudly
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM bm25_index_export_version('$idx', '${dir.resolve("v9")}', '9')")
        .collect()
    }
    assert(e.getMessage != null)
  }
}
