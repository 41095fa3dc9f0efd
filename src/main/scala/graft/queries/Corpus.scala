package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bm25, BigramLm, Bpe, Layout, SpanDedup}

/** Corpus-curation operator surface (round 4): the last-mile operators
  * a pre-training data pipeline runs between raw text and trainer
  * input — exact-substring span dedup, sparse lexical retrieval, LM
  * quality scoring, leakage-free splits, shard layout. Oracle SQL is
  * generated from the same constants as the Spark implementations.
  */
object Corpus {

  private val WindowW = 8
  private val Bm25Terms = Seq("spark", "join", "window")
  private val Bm25TopK = 10
  private val SimhashMaxDist = 3

  /** Exact-substring span dedup (Lee et al.): W-token windows occurring
    * ≥ 2 times corpus-wide, merged into maximal per-doc spans. The
    * oracle groups by the raw window text; the engine by its 64-bit
    * hash — a collision would fail the hash-match. */
  val t17SpanDedup: Q = Q(
    "t17_span_dedup",
    s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |win AS (
       |  SELECT doc_id, i, array_to_string(w[i:i+${WindowW - 1}], ' ') AS g
       |  FROM w, unnest(range(1, len(w) - ${WindowW - 2})) AS u(i)),
       |freq AS (SELECT g FROM win GROUP BY g HAVING count(*) >= 2),
       |dup AS (SELECT doc_id, i FROM win JOIN freq USING (g)),
       |isl AS (
       |  SELECT doc_id, i,
       |         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= $WindowW
       |              THEN 0 ELSE 1 END AS brk
       |  FROM dup),
       |grp AS (
       |  SELECT doc_id, i,
       |         sum(brk) OVER (PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM isl)
       |SELECT doc_id,
       |       CAST(min(i) AS BIGINT) AS span_start,
       |       CAST(max(i) + ${WindowW - 1} AS BIGINT) AS span_end,
       |       CAST(max(i) + ${WindowW - 1} - min(i) + 1 AS BIGINT) AS span_tokens,
       |       CAST(count(*) AS BIGINT) AS n_windows
       |FROM grp GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
    SpanDedup.dupSpans(Tables.documents(s, d), "doc_id", "text", WindowW)
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** BM25 top-k sparse retrieval with rational idf (no transcendentals)
    * and fixed-order per-term score addition — see [[Bm25]]. */
  val t18Bm25: Q = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val partials = Bm25Terms.map(t =>
      s"coalesce(sum(CASE WHEN t = '$t' THEN s END), 0.0) AS s_$t").mkString(",\n       |        ")
    val total = Bm25Terms.map(t => s"s_$t").reduceLeft((a, b) => s"($a + $b)")
    Q(
      "t18_bm25",
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |tf AS (
         |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(w) AS t FROM w)
         |  WHERE t IN ($termList) GROUP BY doc_id, t),
         |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
         |sc AS (
         |  -- the e0 suffixes force DOUBLE literals: DuckDB parses bare
         |  -- 2.2 as DECIMAL and computes tf*2.2 exactly, diverging from
         |  -- the engine's IEEE double arithmetic by 1 ulp
         |  SELECT doc_id, t,
         |         ((n - df + 0.5e0) / (df + 0.5e0)) * (tf * ${Bm25.K1Plus1}e0) /
         |           (tf + ${Bm25.K1}e0 * (${Bm25.OneMinusB}e0 + ${Bm25.B}e0 * (dl / avgdl))) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN st JOIN dfreq USING (t)),
         |agg AS (
         |  SELECT doc_id,
         |        $partials
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, ${Bm25Terms.map(t => s"s_$t").mkString(", ")}, $total AS score
         |FROM agg
         |ORDER BY score DESC, doc_id
         |LIMIT $Bm25TopK""".stripMargin) { (s, d) =>
      Bm25.topK(Tables.documents(s, d), "doc_id", "text", Bm25Terms, Bm25TopK)
    }
  }

  /** The t19/t28 shared oracle chain: per-bigram fixed-point
    * probabilities under the corpus-trained add-one bigram LM. */
  private val lmScoreCtes: String =
    s"""w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |tok AS (
       |  SELECT doc_id, w[i] AS t,
       |         CASE WHEN i < len(w) THEN w[i] || ' ' || w[i+1] END AS g
       |  FROM w, unnest(range(1, len(w) + 1)) AS u(i)),
       |c1 AS (SELECT t, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY t),
       |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
       |c2 AS (SELECT g, CAST(count(*) AS BIGINT) AS c2 FROM tok WHERE g IS NOT NULL GROUP BY g),
       |sc AS (
       |  SELECT doc_id, ((c2 + 1) * ${BigramLm.Scale}) // (c1 + v) AS p
       |  FROM tok JOIN c2 USING (g) JOIN c1 USING (t) CROSS JOIN v)""".stripMargin

  /** Corpus-trained bigram LM scoring in fixed point — see
    * [[BigramLm]]. The oracle counts by raw token/bigram text; the
    * engine by 64-bit hashes. */
  val t19BigramLm: Q = Q(
    "t19_bigram_lm",
    s"""WITH $lmScoreCtes
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       CAST(sum(p) AS BIGINT) AS lm_sum,
       |       CAST(sum(p) // count(*) AS BIGINT) AS lm_mean
       |FROM sc GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    BigramLm.scores(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Cluster-aware train/val/test split: the split decision hashes the
    * near-dup CLUSTER id (t14's components), so no near-duplicate of an
    * eval doc can land in train. Oracle = the t14 recursive-CTE
    * fixpoint + the same md5 bucket rule. */
  val t20LeakfreeSplit: Q = Q(
    "t20_leakfree_split",
    s"""WITH RECURSIVE ${Text.simhashSigCtes},
       |nodes AS (SELECT DISTINCT simhash AS n FROM sigs),
       |e AS (SELECT a.n AS u, b.n AS v FROM nodes a JOIN nodes b
       |      ON a.n < b.n AND bit_count(xor(a.n, b.n)) <= $SimhashMaxDist),
       |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
       |reach(n, l) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT und.v, r.l FROM reach r JOIN und ON und.u = r.n),
       |comp AS (SELECT n, min(l) AS component FROM reach GROUP BY n),
       |dc AS (SELECT s.sid AS doc_id, c.component AS cluster
       |       FROM sigs s JOIN comp c ON s.simhash = c.n),
       |b AS (SELECT doc_id, cluster,
       |        CAST('0x' || substring(md5(CAST(cluster AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bk
       |      FROM dc)
       |SELECT doc_id, cluster,
       |       CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
       |FROM b
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Layout.leakFreeSplit(Tables.documents(s, d), "doc_id", "text", SimhashMaxDist)
      .orderBy(col("doc_id"))
  }

  /** Deterministic shard layout: stable md5 shard bucket + within-shard
    * position, computed by the two-phase range layout instead of a
    * one-task-per-shard window — see [[Layout.shardPositions]]. The
    * oracle IS the naive per-shard window formulation. */
  val t21ShardLayout: Q = Q(
    "t21_shard_layout",
    """WITH k AS (
      |  SELECT doc_id,
      |         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 16 AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents)
      |SELECT doc_id, shard,
      |       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
      |FROM k
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      Layout.md5Bucket(col("doc_id"), 16).as("shard"),
      md5(col("doc_id").cast("string")).as("k"))
    Layout.shardPositions(base, "shard", Seq("k", "doc_id"), "pos")
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget source mixing: cap every source at a fixed token
    * budget, taking documents in stable md5 order — the
    * balance-the-mixture curation step. The oracle IS the naive
    * per-source window formulation that [[Layout.groupRunningTotals]]
    * replaces at scale. */
  val t22SourceMix: Q = {
    val budget = 800L
    Q(
      "t22_source_mix",
      s"""WITH tok AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |         md5(CAST(doc_id AS VARCHAR)) AS k
         |  FROM documents),
         |run AS (
         |  SELECT doc_id, source, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM tok)
         |SELECT doc_id, source, n_tokens, cum_tokens
         |FROM run WHERE cum_tokens <= $budget
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Layout.sourceMix(Tables.documents(s, d), "doc_id", "text", "source", budget)
        .orderBy(col("doc_id"))
    }
  }

  /** Fixed fastText-style linear scorer: integer weights over a small
    * published vocabulary, applied per token OCCURRENCE. The model is a
    * constant here; in production it is a broadcast weight table and
    * the plan shape is identical — a narrow codegen'd scan, no
    * shuffle until the final ORDER BY. */
  private val ModelBias = 2L
  private val ModelThreshold = 5L
  private val ModelWeights: Seq[(String, Long)] = Seq(
    "spark" -> 3L, "query" -> 2L, "join" -> 2L, "table" -> 1L,
    "window" -> 1L, "stream" -> 1L, "batch" -> 1L,
    "the" -> -1L, "a" -> -2L, "slow" -> -3L)

  /** Model-based quality classification at scale (the inference step of
    * a quality-filter pipeline): score = bias + Σ weight(token) over
    * all occurrences, keep = score ≥ threshold. Integer arithmetic
    * end-to-end; oracle applies the same weight table as a CASE
    * cascade. */
  val t24QualityModel: Q = {
    val cases = ModelWeights.map { case (w, v) => s"WHEN '$w' THEN $v" }.mkString(" ")
    Q(
      "t24_quality_model",
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
         |SELECT doc_id,
         |       CAST($ModelBias + list_sum(list_transform(w, t ->
         |         CASE t $cases ELSE 0 END)) AS BIGINT) AS score,
         |       ($ModelBias + list_sum(list_transform(w, t ->
         |         CASE t $cases ELSE 0 END))) >= $ModelThreshold AS keep
         |FROM w
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val weightMap = typedLit(ModelWeights.toMap)
      val w = graft.functions.TextFunctions.tokens(col("text"))
      val score = lit(ModelBias) + aggregate(
        transform(w, t => coalesce(element_at(weightMap, t), lit(0L))),
        lit(0L), _ + _)
      Tables.documents(s, d)
        .select(col("doc_id"), score.as("score"), (score >= ModelThreshold).as("keep"))
        .orderBy(col("doc_id"))
    }
  }

  /** URL canonicalization + URL-level dedup over a synthesized crawl
    * (the q21 pattern: deterministic per-doc noise — case-shuffled
    * scheme/host, default port, utm query, optional trailing slash and
    * fragment). Canonical groups collapse the noise; the oracle runs
    * the identical regex cascade. */
  val t25UrlCanon: Q = Q(
    "t25_url_canon",
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END ||
      |    '://Example' || CAST(doc_id % 3 AS VARCHAR) || '.COM:443/Page/' ||
      |    CAST(doc_id % 50 AS VARCHAR) ||
      |    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
      |    '?utm_source=src' || CAST(doc_id AS VARCHAR) ||
      |    CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, url,
      |    regexp_replace(
      |      regexp_replace(
      |        CASE WHEN regexp_extract(lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+')), '^[a-z]+') = 'https'
      |             THEN regexp_replace(lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+')), ':443$', '')
      |             WHEN regexp_extract(lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+')), '^[a-z]+') = 'http'
      |             THEN regexp_replace(lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+')), ':80$', '')
      |             ELSE lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+')) END ||
      |        substring(regexp_replace(url, '#.*$', ''),
      |                  length(regexp_extract(regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+')) + 1),
      |        '\?utm_.*$', ''),
      |      '/$', '') AS canon_url
      |  FROM u)
      |SELECT canon_url,
      |       CAST(count(*) AS BIGINT) AS n_urls,
      |       min(doc_id) AS keeper_doc_id
      |FROM c GROUP BY canon_url
      |ORDER BY canon_url""".stripMargin) { (s, d) =>
    import graft.operators.Urls
    val url = concat(
      when(col("doc_id") % 2 === 0, "HTTPS").otherwise("https"),
      lit("://Example"), (col("doc_id") % 3).cast("string"), lit(".COM:443/Page/"),
      (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 4 === 0, "/").otherwise(""),
      lit("?utm_source=src"), col("doc_id").cast("string"),
      when(col("doc_id") % 5 === 0, "#frag").otherwise(""))
    Tables.documents(s, d)
      .select(col("doc_id"), Urls.canonicalize(url).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("canon_url"))
  }

  /** Temperature-balanced source sampling (α = 0.5 with integerized
    * weights — see [[Layout.temperatureSample]]): sample ~40% of the
    * corpus with small sources boosted toward equal representation.
    * The oracle repeats the identical integer/single-division
    * arithmetic. */
  val t26TempSample: Q = Q(
    "t26_temp_sample",
    """WITH c AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS c,
      |         CAST(floor(sqrt(count(*))) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |s AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS z FROM c),
      |r AS (
      |  -- factors cast to DOUBLE BEFORE multiplying, mirroring the
      |  -- engine: BIGINT w*t / z*c would overflow at 10^12 docs
      |  SELECT source, least(1.0e0,
      |           (CAST(w AS DOUBLE) * CAST((n * 2) // 5 AS DOUBLE)) /
      |           (CAST(z AS DOUBLE) * CAST(c AS DOUBLE))) AS rate
      |  FROM c CROSS JOIN s)
      |SELECT d.doc_id, d.source
      |FROM documents d JOIN r USING (source)
      |WHERE CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
      |      < rate * 1152921504606846976.0e0
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Layout.temperatureSample(Tables.documents(s, d), "doc_id", "source",
      targetNum = 2, targetDen = 5)
      .orderBy(col("doc_id"))
  }

  /** BPE vocab induction, first merge step (see [[Bpe]]): corpus-wide
    * adjacent character-pair counts weighted by word occurrence, top-20
    * by (count desc, pair). Integer counts end-to-end; the oracle
    * counts pair INSTANCES, which equals the engine's word-count
    * weighting. The iterative trainer ([[Bpe.train]]) ranks merges with
    * exactly this statistic — BpeSpec pins it to the textbook example. */
  val t27BpePairs: Q = Q(
    "t27_bpe_pairs",
    """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |tok AS (SELECT unnest(toks) AS t FROM w),
      |pr AS (
      |  SELECT substring(t, i, 1) AS a, substring(t, i + 1, 1) AS b
      |  FROM tok, unnest(range(1, length(t))) AS u(i))
      |SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
      |FROM pr GROUP BY a, b
      |ORDER BY cnt DESC, a, b
      |LIMIT 20""".stripMargin) { (s, d) =>
    Bpe.topPairs(Tables.documents(s, d), "text", 20)
  }

  /** CCNet-style quality-tier bucketing (see
    * [[graft.operators.Quality]]): exact global rank by (lm_mean,
    * doc_id) via the two-phase prefix layout — the oracle IS the naive
    * single-task `row_number() OVER (ORDER BY ...)` formulation the
    * operator replaces at scale. */
  val t28PplBuckets: Q = Q(
    "t28_ppl_buckets",
    s"""WITH $lmScoreCtes,
       |lm AS (
       |  SELECT doc_id, CAST(sum(p) // count(*) AS BIGINT) AS lm_mean
       |  FROM sc GROUP BY doc_id),
       |r AS (
       |  SELECT doc_id, lm_mean,
       |         row_number() OVER (ORDER BY lm_mean, doc_id) AS rnk,
       |         count(*) OVER () AS n
       |  FROM lm)
       |SELECT doc_id, lm_mean, CAST(((rnk - 1) * 3) // n AS BIGINT) AS bucket
       |FROM r
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Quality.pplBuckets(Tables.documents(s, d), "doc_id", "text", 3)
      .orderBy(col("doc_id"))
  }

  /** Exact n-gram eval-set decontamination (GPT-3 appx-C / Llama style;
    * distinct from t13's minhash-SIMILARITY gate — here ONE shared
    * 8-token window anywhere is a hit). Eval corpus = every 29th doc;
    * the operator flags training docs sharing any window with it. The
    * oracle joins raw window texts; the engine joins 64-bit hashes
    * against a broadcast distinct-eval-hash frame — the train corpus
    * never shuffles. */
  val t31NgramDecontam: Q = Q(
    "t31_ngram_decontam",
    s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |win AS (
       |  SELECT doc_id, i, array_to_string(w[i:i+${WindowW - 1}], ' ') AS g
       |  FROM w, unnest(range(1, len(w) - ${WindowW - 2})) AS u(i)),
       |ev AS (SELECT DISTINCT g FROM win WHERE doc_id % 29 = 0),
       |hit AS (SELECT win.doc_id, win.g FROM win JOIN ev USING (g) WHERE win.doc_id % 29 <> 0)
       |SELECT doc_id,
       |       CAST(count(DISTINCT g) AS BIGINT) AS n_hit_windows,
       |       CAST(count(*) AS BIGINT) AS n_hit_positions
       |FROM hit GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    SpanDedup.ngramContamination(
      docs.filter(col("doc_id") % 29 =!= 0),
      docs.filter(col("doc_id") % 29 === 0),
      "doc_id", "text", WindowW)
      .orderBy(col("doc_id"))
  }

  /** Apply-side of Lee et al.: cut duplicated spans, keep-first
    * corpus-wide ((doc_id, pos) order). clean_text is the kept tokens
    * space-joined — canonical tokenized form on BOTH engines, so the
    * hash-compare is exact even where raw text had irregular
    * whitespace. */
  val t32SpanCut: Q = Q(
    "t32_span_cut",
    s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |win AS (
       |  SELECT doc_id, i, array_to_string(w[i:i+${WindowW - 1}], ' ') AS g
       |  FROM w, unnest(range(1, len(w) - ${WindowW - 2})) AS u(i)),
       |cuts AS (SELECT doc_id, i FROM win
       |         QUALIFY row_number() OVER (PARTITION BY g ORDER BY doc_id, i) > 1),
       |cov AS (SELECT DISTINCT doc_id, CAST(u.p AS BIGINT) AS p
       |        FROM cuts, unnest(range(i, i + $WindowW)) AS u(p)),
       |tok AS (SELECT doc_id, CAST(u.j AS BIGINT) AS j, w[j] AS t
       |        FROM w, unnest(range(1, len(w) + 1)) AS u(j)),
       |kept AS (SELECT tok.doc_id, j, t FROM tok
       |         LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.j
       |         WHERE cov.p IS NULL),
       |agg AS (SELECT doc_id, string_agg(t, ' ' ORDER BY j) AS clean_text
       |        FROM kept GROUP BY doc_id),
       |ncut AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut_tokens
       |         FROM cov GROUP BY doc_id)
       |SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       |       coalesce(ncut.n_cut_tokens, 0) AS n_cut_tokens
       |FROM w LEFT JOIN agg USING (doc_id) LEFT JOIN ncut USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    SpanDedup.cutSpans(Tables.documents(s, d), "doc_id", "text", WindowW)
      .orderBy(col("doc_id"))
  }

  /** Fixed-point integer PageRank over a synthesized doc link graph
    * (3 out-links per doc by closed-form modulus) — the crawl-graph
    * quality weight, 3 message-passing rounds. Integer arithmetic at
    * every step, so the DuckDB oracle (the 3 rounds unrolled as CTEs)
    * matches bit-for-bit. */
  val t33PageRank: Q = Q(
    "t33_pagerank",
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |e0 AS (SELECT doc_id AS src, (doc_id*7+1) % n AS dst FROM documents, nn
      |       UNION SELECT doc_id, (doc_id*13+2) % n FROM documents, nn
      |       UNION SELECT doc_id, (doc_id*19+3) % n FROM documents, nn),
      |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |od AS (SELECT src, count(*) AS d FROM e GROUP BY src),
      |r0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS r FROM documents),
      |c1 AS (SELECT e.dst AS v, sum(r0.r // od.d) AS s FROM e JOIN od USING (src)
      |       JOIN r0 ON r0.v = e.src GROUP BY e.dst),
      |r1 AS (SELECT r0.v, CAST(150000 + 85 * coalesce(c1.s, 0) // 100 AS BIGINT) AS r
      |       FROM r0 LEFT JOIN c1 USING (v)),
      |c2 AS (SELECT e.dst AS v, sum(r1.r // od.d) AS s FROM e JOIN od USING (src)
      |       JOIN r1 ON r1.v = e.src GROUP BY e.dst),
      |r2 AS (SELECT r1.v, CAST(150000 + 85 * coalesce(c2.s, 0) // 100 AS BIGINT) AS r
      |       FROM r1 LEFT JOIN c2 USING (v)),
      |c3 AS (SELECT e.dst AS v, sum(r2.r // od.d) AS s FROM e JOIN od USING (src)
      |       JOIN r2 ON r2.v = e.src GROUP BY e.dst),
      |r3 AS (SELECT r2.v, CAST(150000 + 85 * coalesce(c3.s, 0) // 100 AS BIGINT) AS r
      |       FROM r2 LEFT JOIN c3 USING (v))
      |SELECT v AS doc_id, r AS pagerank FROM r3 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val n = docs.count()
    val ids = docs.select(col("doc_id"))
    val edges = Seq((7L, 1L), (13L, 2L), (19L, 3L))
      .map { case (a, b) =>
        ids.select(col("doc_id").as("src"),
          ((col("doc_id") * a + b) % n).as("dst"))
      }
      .reduce(_ unionAll _)
    graft.operators.PageRank.run(edges, "src", "dst", ids, "doc_id", iters = 3)
      .select(col("node").as("doc_id"), col("pagerank"))
      .orderBy(col("doc_id"))
  }

  /** Broadcast multi-phrase tagging (blocklist / topic-lexicon pass) —
    * one narrow scan tags every doc against a driver-sized phrase
    * list; non-overlapping left-to-right counts, which is exactly
    * SQL's replace-length formula, so the oracle is independent. */
  val t34PhraseTags: Q = {
    val phrases = Seq("table table", "fast scan", "agg row", "the line sort")
    val sqlRows = phrases.map { p =>
      s"""SELECT doc_id, '$p' AS phrase,
         |  CAST((length(text) - length(replace(text, '$p', ''))) // ${p.length} AS BIGINT) AS n_hits
         |FROM documents""".stripMargin
    }.mkString("\n  UNION ALL ")
    Q(
      "t34_phrase_tags",
      s"""WITH hits AS (
         |  $sqlRows)
         |SELECT doc_id, phrase, n_hits FROM hits WHERE n_hits > 0
         |ORDER BY doc_id, phrase""".stripMargin) { (s, d) =>
      graft.operators.Phrases.tag(Tables.documents(s, d), "doc_id", "text", phrases)
        .orderBy(col("doc_id"), col("phrase"))
    }
  }

  /** Frequency-based boilerplate removal (the C4 "line occurred three
    * or more times" rule generalised to k-token chunks): every
    * occurrence of a chunk found in ≥ 3 distinct documents is cut —
    * dedup keeps one copy, boilerplate removal keeps NONE. See
    * [[graft.operators.Boilerplate]]; the 2-token guard protects
    * single-word tail chunks (vocabulary, not boilerplate). */
  val t35Boilerplate: Q = {
    val k = 8
    val maxDf = 3
    val minTok = 2
    Q(
      "t35_boilerplate",
      // nw mirrors the ENGINE's empty/whitespace-only guard: DuckDB's
      // string_split_regex yields [''] on empty text, which would count
      // one chunk and let '' join bad-chunk doc frequency; the engine
      // (array_remove of '' / the chunkOccs empty-token guard) yields
      // zero chunks — the oracle must agree on ANY corpus, not only
      // ones with no empty documents
      s"""WITH w0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |w AS (SELECT doc_id, w,
         |        CASE WHEN len(w) = 1 AND w[1] = '' THEN 0 ELSE len(w) END AS nw
         |      FROM w0),
         |chun AS (
         |  SELECT doc_id, CAST(u.i AS BIGINT) AS idx,
         |         array_to_string(w[u.i*$k+1:u.i*$k+$k], ' ') AS chunk,
         |         least(nw - u.i*$k, $k) AS chunk_len
         |  FROM w, unnest(range(0, (nw + ${k - 1}) // $k)) AS u(i)),
         |bad AS (SELECT chunk FROM chun GROUP BY chunk
         |        HAVING count(DISTINCT doc_id) >= $maxDf),
         |cut AS (SELECT c.doc_id, c.idx FROM chun c JOIN bad USING (chunk)
         |        WHERE c.chunk_len >= $minTok),
         |keptc AS (SELECT c.doc_id, c.idx, c.chunk FROM chun c
         |          LEFT JOIN cut ON cut.doc_id = c.doc_id AND cut.idx = c.idx
         |          WHERE cut.idx IS NULL),
         |agg AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS clean_text
         |        FROM keptc GROUP BY doc_id),
         |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dropped
         |       FROM cut GROUP BY doc_id)
         |SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
         |       CAST((nw + ${k - 1}) // $k AS BIGINT) AS n_chunks,
         |       coalesce(nd.n_dropped, 0) AS n_dropped
         |FROM w LEFT JOIN agg USING (doc_id) LEFT JOIN nd USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Boilerplate.remove(Tables.documents(s, d), "doc_id", "text",
        k, maxDf, minTok)
        .orderBy(col("doc_id"))
    }
  }

  /** Epoch-based source re-weighting (the Llama-style data-budget
    * table): src0 runs 2.75 epochs, src1 1.5, src2 is down-sampled to
    * 0.6, src3 excluded, everything else 1 epoch. Fractional epochs
    * gate on a salted md5 of the doc id — exact integer arithmetic on
    * both engines. See [[graft.operators.Layout.epochUpsample]]. */
  val t36EpochUpsample: Q = {
    val pcts = Map("src0" -> 275, "src1" -> 150, "src2" -> 60, "src3" -> 0)
    val cases = pcts.toSeq.sortBy(_._1)
      .map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    Q(
      "t36_epoch_upsample",
      s"""WITH p AS (
         |  SELECT doc_id, source,
         |         CAST(CASE source $cases ELSE 100 END AS BIGINT) AS pct,
         |         CAST('0x' || substring(md5('ep:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS g
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, source,
         |         pct // 100 + CASE WHEN g < pct % 100 THEN 1 ELSE 0 END AS n_copies
         |  FROM p)
         |SELECT doc_id, source, CAST(u.c AS BIGINT) AS copy_no
         |FROM n, unnest(range(1, n_copies + 1)) AS u(c)
         |ORDER BY doc_id, copy_no""".stripMargin) { (s, d) =>
      graft.operators.Layout.epochUpsample(Tables.documents(s, d), "doc_id", "source", pcts)
        .orderBy(col("doc_id"), col("copy_no"))
    }
  }

  /** DSIR-style domain selection (Xie et al. 2023) in the fixed-point
    * deterministic form — see [[graft.operators.Dsir]]. Docs with
    * doc_id % 17 == 0 stand in for the target-domain sample (the t13
    * convention); every other document is scored by the integer-mean
    * hashed-unigram+bigram importance ratio and selected against the
    * pool's global mean. The oracle counts by raw feature text; the
    * engine by 64-bit hashes. */
  val t37DsirSelect: Q = {
    val s = BigramLm.Scale
    Q(
      "t37_dsir_select",
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |tokall AS (
         |  SELECT doc_id, w[i] AS t,
         |         CASE WHEN i < len(w) THEN w[i] || ' ' || w[i+1] END AS g
         |  FROM w, unnest(range(1, len(w) + 1)) AS u(i)),
         |feat AS (SELECT doc_id, t AS f FROM tokall WHERE t <> ''
         |         UNION ALL SELECT doc_id, g FROM tokall WHERE g IS NOT NULL),
         |tcnt AS (SELECT f, CAST(count(*) AS BIGINT) AS ct FROM feat
         |         WHERE doc_id % 17 = 0 GROUP BY f),
         |rcnt AS (SELECT f, CAST(count(*) AS BIGINT) AS cr FROM feat
         |         WHERE doc_id % 17 <> 0 GROUP BY f),
         |tstat AS (SELECT greatest(CAST(coalesce(sum(ct), 0) AS BIGINT)
         |                 + CAST(count(*) AS BIGINT), 1) AS dt FROM tcnt),
         |rstat AS (SELECT greatest(CAST(coalesce(sum(cr), 0) AS BIGINT)
         |                 + CAST(count(*) AS BIGINT), 1) AS dr FROM rcnt),
         |sc AS (
         |  SELECT feat.doc_id,
         |         (((coalesce(ct, 0) + 1) * $s) // dt * $s)
         |           // greatest(((cr + 1) * $s) // dr, 1) AS r
         |  FROM feat
         |  LEFT JOIN tcnt USING (f)
         |  JOIN rcnt USING (f)
         |  CROSS JOIN tstat CROSS JOIN rstat
         |  WHERE feat.doc_id % 17 <> 0),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |         CAST(sum(r) AS BIGINT) AS w_sum,
         |         CAST(sum(r) // count(*) AS BIGINT) AS w_mean
         |  FROM sc GROUP BY doc_id),
         |gstat AS (SELECT CAST(sum(w_mean) // count(*) AS BIGINT) AS gmean FROM agg)
         |SELECT doc_id, n_feats, w_sum, w_mean, (w_mean > gmean) AS selected
         |FROM agg CROSS JOIN gstat
         |ORDER BY doc_id""".stripMargin) { (sp, d) =>
      val docs = Tables.documents(sp, d)
      graft.operators.Dsir.select(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    }
  }

  /** Stratified eval-set construction: a fixed per-stratum quota (5
    * docs per source) drawn by deterministic salted-md5 order — every
    * stratum is represented in the held-out set regardless of its
    * corpus share, and the draw is reproducible across runs, engines
    * and partitionings. One window exchange on the stratum key. */
  val t38StratifiedEval: Q = {
    val quota = 5
    Q(
      "t38_stratified_eval",
      s"""SELECT doc_id, source, CAST(stratum_rank AS BIGINT) AS stratum_rank,
         |       (stratum_rank <= $quota) AS is_eval
         |FROM (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY md5('ev:' || CAST(doc_id AS VARCHAR)), doc_id) AS stratum_rank
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val key = md5(concat(lit("ev:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("source")).orderBy(key, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          row_number().over(w).cast("long").as("stratum_rank"))
        .select(col("doc_id"), col("source"), col("stratum_rank"),
          (col("stratum_rank") <= quota).as("is_eval"))
        .orderBy(col("doc_id"))
    }
  }

  /** Shared closed-form oracle for the batch/served BM25 paths: the
    * query set is synthesized from the corpus itself (docs with
    * doc_id ≡ `rem` (mod `mod`); the distinct tokens at 1-based
    * `positions` — min corpus doc length is 10, so the positions always
    * exist), and the score replays [[Bm25]]'s exact arithmetic: rational
    * idf, e0-suffixed double literals, ≥ 80 %-df stopword prune, and
    * per-term scores floored into the 10⁶ fixed-point domain so the
    * per-(query, doc) total is an order-independent integer sum. */
  private def bm25BatchSql(mod: Int, rem: Int, positions: Seq[Int], k: Int,
      corpusWhere: String = "TRUE",
      corpusFrom: String = "documents"): String =
    s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $corpusFrom WHERE $corpusWhere),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |q AS (SELECT DISTINCT doc_id AS qid, t FROM (
       |  SELECT doc_id, unnest([${positions.map(p => s"w[$p]").mkString(", ")}]) AS t
       |  FROM w WHERE doc_id % $mod = $rem)),
       |qt AS (SELECT DISTINCT t FROM q),
       |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(w) AS t FROM w) JOIN qt USING (t)
       |       GROUP BY doc_id, t),
       |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
       |kept AS (SELECT t, df FROM dfreq CROSS JOIN st
       |         WHERE df * ${Bm25.PruneDfDen} < n * ${Bm25.PruneDfNum}),
       |sc AS (SELECT q.qid, tf.doc_id,
       |        CAST(floor((((n - df + 0.5e0) / (df + 0.5e0)) * (tf * ${Bm25.K1Plus1}e0) /
       |          (tf + ${Bm25.K1}e0 * (${Bm25.OneMinusB}e0 + ${Bm25.B}e0 * (dl / avgdl))))
       |          * 1000000.0e0) AS BIGINT) AS s
       |       FROM tf JOIN kept USING (t) JOIN dl USING (doc_id) CROSS JOIN st JOIN q USING (t)),
       |agg AS (SELECT qid, doc_id, CAST(sum(s) AS BIGINT) AS score
       |        FROM sc GROUP BY qid, doc_id),
       |rk AS (SELECT qid, doc_id, score,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |       FROM agg)
       |SELECT qid, doc_id, score, rank FROM rk WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** The corpus-derived (qid, term) query frame matching [[bm25BatchSql]]. */
  private def bm25Queries(docs: org.apache.spark.sql.DataFrame,
      mod: Int, rem: Int, positions: Seq[Int]): org.apache.spark.sql.DataFrame = {
    val w = graft.functions.TextFunctions.tokens(col("text"))
    docs.filter(col("doc_id") % mod === rem)
      .select(col("doc_id").as("qid"),
        explode(array(positions.map(p => element_at(w, p)): _*)).as("term"))
  }

  /** Batch multi-query BM25 retrieval — the engine's sparse-retrieval
    * analog of the v4/v7 ANN batch paths: a dimension-sized query batch
    * rides broadcasts, only queried-term postings shuffle, per-query
    * top-k ranks without a global sort. See [[Bm25.batchTopK]]. */
  val t40Bm25Batch: Q = Q(
    "t40_bm25_batch",
    bm25BatchSql(mod = 50, rem = 0, positions = Seq(1, 3, 5, 7), k = 5)) { (s, d) =>
    val docs = Tables.documents(s, d)
    Bm25.batchTopK(docs, "doc_id", "text",
        bm25Queries(docs, 50, 0, Seq(1, 3, 5, 7)), k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Standing-index cache per SF dir: postings written once per JVM,
    * partitioned by term bucket (the IVF-cell layout discipline). */
  private val bm25IndexCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[queries] def bm25Index(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25IndexCache.getOrElseUpdate(d, {
      val dir = s"/tmp/graft_bm25_index_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(Tables.documents(s, d), "doc_id", "text", dir)
      dir
    })

  /** Served BM25: the deployment shape — build the inverted index once
    * (term-bucketed postings + 1-row stats), serve query batches with
    * partition-pruned reads that never touch buckets outside the
    * query's terms. Oracle is closed-form over the corpus (the index is
    * a deterministic function of it). See [[Bm25.serveTopK]]. */
  val t41Bm25Served: Q = Q(
    "t41_bm25_served",
    bm25BatchSql(mod = 100, rem = 7, positions = Seq(2, 4, 6, 8), k = 7)) { (s, d) =>
    val docs = Tables.documents(s, d)
    Bm25.serveTopK(s, bm25Index(s, d),
        bm25Queries(docs, 100, 7, Seq(2, 4, 6, 8)), k = 7)
      .orderBy(col("qid"), col("rank"))
  }

  /** Build-then-append cache backing [[t50Bm25Append]]: index built on
    * doc_id % 3 ≠ 2, then the % 3 = 2 batch appended — the ACCRETIVE
    * tick ([[Bm25.appendToIndex]]: batch rows only, df read-time). */
  private val bm25AppendCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25AppendedIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25AppendCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val dir = s"/tmp/graft_bm25_append_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", dir)
      Bm25.appendToIndex(s, dir, docs.filter(col("doc_id") % 3 === 2), "doc_id", "text")
      dir
    })

  /** Standing-BM25-index APPEND tick ([[Bm25.appendToIndex]]): t41
    * serves a frozen index — this entry grows it. The tick is
    * ACCRETIVE (round 16): only batch-derived rows are written, the
    * touched buckets' manifest lists accrete, and df resolves at READ
    * time (rows-per-term inside the whole-bucket read), so no stored
    * value can go stale and per-append cost is O(batch) at any index
    * size. The oracle is the one-shot index over the FULL corpus (the
    * same [[bm25BatchSql]] as t40/t41) — a wrong read-time df, lost
    * row or wrong stats after the append breaks the hash. */
  val t50Bm25Append: Q = Q(
    "t50_bm25_append",
    bm25BatchSql(mod = 100, rem = 13, positions = Seq(1, 4, 6, 9), k = 6)) { (s, d) =>
    val docs = Tables.documents(s, d)
    Bm25.serveTopK(s, bm25AppendedIndex(s, d),
        bm25Queries(docs, 100, 13, Seq(1, 4, 6, 9)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** Build-then-DELETE cache backing [[t56Bm25Delete]]: index built on
    * the FULL corpus, then the doc_id % 9 = 4 slice removed by the
    * takedown tick ([[Bm25.deleteFromIndex]]) — only the slice's term
    * buckets rewritten, df recomputed inside the remaining union,
    * stats rolled back. */
  private val bm25DeleteCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25DeletedIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25DeleteCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val dir = s"/tmp/graft_bm25_delete_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(docs, "doc_id", "text", dir)
      Bm25.deleteFromIndex(s, dir, docs.filter(col("doc_id") % 9 === 4),
        "doc_id", "text")
      dir
    })

  /** Standing-BM25-index DELETE tick ([[Bm25.deleteFromIndex]]) — the
    * takedown/opt-out verb: t50 grows the index, this shrinks it. The
    * oracle is the one-shot index over the corpus MINUS the deleted
    * slice — a surviving posting row, stale df, or unrolled stats after
    * the delete breaks the hash (delete == rebuild, the inverse of
    * t50's append == rebuild). */
  val t56Bm25Delete: Q = Q(
    "t56_bm25_delete",
    bm25BatchSql(mod = 100, rem = 21, positions = Seq(2, 3, 8), k = 6,
      corpusWhere = "doc_id % 9 <> 4")) { (s, d) =>
    val remaining = Tables.documents(s, d).filter(col("doc_id") % 9 =!= 4)
    Bm25.serveTopK(s, bm25DeletedIndex(s, d),
        bm25Queries(remaining, 100, 21, Seq(2, 3, 8)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** Build-then-DELETE-BY-IDS cache backing [[t57Bm25DeleteIds]]: index
    * built on the FULL corpus, then the doc_id % 7 = 3 slice removed by
    * the ID-ONLY takedown tick ([[Bm25.deleteByIds]]) — the real
    * opt-out feed shape (no text): the victims' term buckets are
    * located through the doc→bucket reverse map (read ≤ |ids| dbucket
    * dirs — no postings scan; the full-scan path survives only for
    * pre-docmap legacy dirs), only buckets that held their rows
    * rewrite, and the stats roll derives from the index itself. */
  private val bm25DeleteIdsCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25DeletedByIdsIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25DeleteIdsCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val dir = s"/tmp/graft_bm25_delids_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(docs, "doc_id", "text", dir)
      Bm25.deleteByIds(s, dir,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")), "doc_id")
      dir
    })

  /** ID-ONLY standing-index DELETE tick ([[Bm25.deleteByIds]]) — the
    * takedown fallback for requests that carry only ids: t56 deletes
    * with the text locating the buckets, this one locates by scanning
    * the committed postings and rolls stats by what the index actually
    * held. The oracle is the same one-shot rebuild over the remaining
    * corpus — a surviving posting, stale df, or wrong stats roll after
    * the id-only tick breaks the hash (deleteByIds == rebuild for
    * token-bearing corpora, which this one is). */
  val t57Bm25DeleteIds: Q = Q(
    "t57_bm25_delete_ids",
    bm25BatchSql(mod = 100, rem = 33, positions = Seq(1, 5, 9), k = 6,
      corpusWhere = "doc_id % 7 <> 3")) { (s, d) =>
    val remaining = Tables.documents(s, d).filter(col("doc_id") % 7 =!= 3)
    Bm25.serveTopK(s, bm25DeletedByIdsIndex(s, d),
        bm25Queries(remaining, 100, 33, Seq(1, 5, 9)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** Build → ACCRETIVE append → DELETE-BY-IDS chain cache backing
    * [[t63Bm25TakedownChain]]: the index is built on doc_id % 3 ≠ 2,
    * grown by the accretive append tick (% 3 = 2 — the touched
    * dbuckets' docVersions lists hold TWO contributing versions at
    * that point), then the doc_id % 7 = 3 slice is removed by the
    * id-only takedown, which must locate every victim's term buckets
    * through the MULTI-VERSION reverse map (round 17's accretive
    * docmap) and consolidate the touched dbuckets back to one
    * version. */
  private val bm25ChainCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25ChainIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25ChainCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val dir = s"/tmp/graft_bm25_chain_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", dir)
      Bm25.appendToIndex(s, dir, docs.filter(col("doc_id") % 3 === 2),
        "doc_id", "text")
      Bm25.deleteByIds(s, dir,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")), "doc_id")
      dir
    })

  /** The accretive-docmap TAKEDOWN CHAIN — t50's append followed by
    * t57's id-only delete on ONE standing index: at delete time the
    * touched dbuckets are multi-version lists (the round-17 accretive
    * model), so the locate must read the reverse map FUSED across
    * contributing versions and the consolidation must collapse them
    * without losing either version's rows. t57 pins the takedown on a
    * single-version docmap; this row pins it on an accreted one —
    * through the driver's DuckDB gate, not only ReverseMapSpec. The
    * oracle is the one-shot index over the corpus MINUS the deleted
    * slice (chain == rebuild). */
  val t63Bm25TakedownChain: Q = Q(
    "t63_bm25_takedown_chain",
    bm25BatchSql(mod = 100, rem = 41, positions = Seq(2, 5, 7), k = 6,
      corpusWhere = "doc_id % 7 <> 3")) { (s, d) =>
    val remaining = Tables.documents(s, d).filter(col("doc_id") % 7 =!= 3)
    Bm25.serveTopK(s, bm25ChainIndex(s, d),
        bm25Queries(remaining, 100, 41, Seq(2, 5, 7)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** Export-clone cache backing [[t64Bm25Export]]: t50's
    * build-then-append dir (fragmented — the touched buckets' manifest
    * lists hold two versions) deep-cloned by [[Bm25.exportIndex]] into
    * a fresh dir; the serve below runs ENTIRELY on the clone's files. */
  private val bm25ExportCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25ExportedIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25ExportCache.getOrElseUpdate(d, {
      val dir = s"/tmp/graft_bm25_export_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.exportIndex(s, bm25AppendedIndex(s, d), dir)
      dir
    })

  /** EXPORT / deep-clone verb ([[Bm25.exportIndex]] — the promotion /
    * DR read of the lifecycle): t50's fragmented appended index is
    * cloned into a fresh dir (only manifest-referenced files cross;
    * the manifest body is published verbatim) and THIS row serves from
    * the clone — a lost partition, a dropped accreted version, or a
    * mangled stats copy breaks the hash. The oracle is the one-shot
    * index over the full corpus, as for t50 (export == source ==
    * rebuild). */
  val t64Bm25Export: Q = Q(
    "t64_bm25_export",
    bm25BatchSql(mod = 100, rem = 53, positions = Seq(3, 6, 8), k = 6)) { (s, d) =>
    val docs = Tables.documents(s, d)
    Bm25.serveTopK(s, bm25ExportedIndex(s, d),
        bm25Queries(docs, 100, 53, Seq(3, 6, 8)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** Index-profile monitoring row ([[Bm25.indexProfile]]) over the
    * build-then-append standing index (t50's dir): doc count, token
    * mass, vocabulary size, postings mass, serving-prune pressure and
    * max df — the avgdl-drift / vocabulary-growth / skew alarms a
    * standing BM25 deployment monitors, computed from the committed
    * artifacts alone. INTEGRITY SENTINEL: `distinct_terms`/`sum_df`
    * count distinct (term, df) pairs from the DENORMALIZED postings
    * while `postings_rows` counts raw rows; the oracle recomputes all
    * of them from the source corpus, so a single stale df after the
    * append (two (t, df) pairs for one term) breaks three aggregates
    * at once. */
  val t55Bm25Profile: Q = Q(
    "t55_bm25_profile",
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
       |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(w) AS t FROM w) GROUP BY doc_id, t),
       |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sdl FROM dl),
       |ta AS (SELECT CAST(count(*) AS BIGINT) AS distinct_terms,
       |              CAST(sum(df) AS BIGINT) AS sum_df,
       |              CAST(max(df) AS BIGINT) AS max_df FROM dfreq),
       |pr AS (SELECT CAST(count(*) AS BIGINT) AS pruned_terms
       |       FROM dfreq, st WHERE df * ${Bm25.PruneDfDen} >= n * ${Bm25.PruneDfNum})
       |SELECT n, sdl, distinct_terms, sum_df AS postings_rows, sum_df, pruned_terms, max_df
       |FROM st, ta, pr
       |ORDER BY n""".stripMargin) { (s, d) =>
    Bm25.indexProfile(s, bm25AppendedIndex(s, d)).orderBy(col("n"))
  }

  /** Hybrid-retrieval fusion constants (t48): query set, per-leg depth,
    * fused depth. Shared verbatim by the oracle SQL. */
  private val HybridQMod = 40
  private val HybridQRem = 3
  private val HybridPositions = Seq(1, 3, 5, 7)
  private val HybridKLeg = 10
  private val HybridK = 10

  /** Hybrid retrieval: BM25 lexical leg + exact-cosine vector leg over
    * the SAME corpus (documents ∩ embeddings on doc_id = vec_id),
    * fused by integer Reciprocal-Rank Fusion — see
    * [[graft.operators.Hybrid]]. Both legs are self-excluded (retrieval
    * wants neighbors, not the query doc). The oracle replays each leg's
    * exact arithmetic (the t40 BM25 CTEs, the v1 cosine fold) and the
    * BIGINT `scale DIV (κ + rank)` fusion bit-for-bit. */
  val t48HybridRrf: Q = {
    val kap = graft.operators.Hybrid.RrfKappa
    val scale = graft.operators.Hybrid.RrfScale
    Q(
      "t48_hybrid_rrf",
      s"""WITH corp AS (SELECT d.doc_id, d.text FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM corp),
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |q AS (SELECT DISTINCT doc_id AS qid, t FROM (
         |  SELECT doc_id, unnest([${HybridPositions.map(p => s"w[$p]").mkString(", ")}]) AS t
         |  FROM w WHERE doc_id % $HybridQMod = $HybridQRem)),
         |qt AS (SELECT DISTINCT t FROM q),
         |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |       FROM (SELECT doc_id, unnest(w) AS t FROM w) JOIN qt USING (t)
         |       GROUP BY doc_id, t),
         |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
         |kept AS (SELECT t, df FROM dfreq CROSS JOIN st
         |         WHERE df * ${Bm25.PruneDfDen} < n * ${Bm25.PruneDfNum}),
         |sc AS (SELECT q.qid, tf.doc_id,
         |        CAST(floor((((n - df + 0.5e0) / (df + 0.5e0)) * (tf * ${Bm25.K1Plus1}e0) /
         |          (tf + ${Bm25.K1}e0 * (${Bm25.OneMinusB}e0 + ${Bm25.B}e0 * (dl / avgdl))))
         |          * 1000000.0e0) AS BIGINT) AS s
         |       FROM tf JOIN kept USING (t) JOIN dl USING (doc_id) CROSS JOIN st JOIN q USING (t)),
         |lexagg AS (SELECT qid, doc_id, CAST(sum(s) AS BIGINT) AS score
         |           FROM sc GROUP BY qid, doc_id),
         |lex AS (SELECT qid, doc_id,
         |          CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |        FROM lexagg WHERE doc_id <> qid),
         |emb2 AS (SELECT e.vec_id, e.embedding FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
         |qv AS (SELECT vec_id AS qid, embedding AS qvec FROM emb2 WHERE vec_id % $HybridQMod = $HybridQRem),
         |vecscored AS (SELECT qid, vec_id AS doc_id,
         |                ${Embedding.sqlCosine("qvec", "embedding")} AS cosine
         |              FROM qv JOIN emb2 ON qid <> vec_id),
         |vec AS (SELECT qid, doc_id,
         |          CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank
         |        FROM vecscored),
         |contrib AS (
         |  SELECT qid, doc_id, $scale // ($kap + rank) AS c FROM lex WHERE rank <= $HybridKLeg
         |  UNION ALL
         |  SELECT qid, doc_id, $scale // ($kap + rank) AS c FROM vec WHERE rank <= $HybridKLeg),
         |fused AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS rrf
         |          FROM contrib GROUP BY qid, doc_id)
         |SELECT qid, doc_id, rrf, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT qid, doc_id, rrf,
         |         row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rank
         |  FROM fused)
         |WHERE rank <= $HybridK
         |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(docs("doc_id"), docs("text"), emb("embedding"))
      val w = graft.functions.TextFunctions.tokens(col("text"))
      val queries = corpus.filter(col("doc_id") % HybridQMod === HybridQRem)
        .select(col("doc_id").as("qid"), col("embedding").as("qvec"),
          explode(array(HybridPositions.map(p => element_at(w, p)): _*)).as("term"))
      graft.operators.Hybrid
        .hybridTopK(corpus, "doc_id", "text", "embedding", queries, HybridKLeg, HybridK)
        .orderBy(col("qid"), col("rank"))
    }
  }

  /** SERVED hybrid retrieval — t48's deployment shape: the lexical leg
    * reads the standing term-bucketed BM25 index (partition-pruned,
    * t41's path) and the vector leg probes the standing cell-partitioned
    * IVF index (v11's path, nprobe=12) — neither leg re-scans its
    * corpus — then integer RRF fuses them. The legs deliberately cover
    * DIFFERENT corpora (all documents vs all embeddings): fusing
    * indexes with different coverage is the normal production state,
    * and RRF handles it by construction (absent-from-one-leg docs just
    * get one contribution). The oracle replays the t40 BM25 CTEs
    * (serve == batch bit-identically), the IVF serve math from the
    * persisted centroids, and the BIGINT fusion. */
  private val HsQMod = 50
  private val HsQRem = 9
  private val HsPositions = Seq(2, 5, 7, 9)
  private val HsKLeg = 10
  private val HsK = 10
  private val HsNprobe = 12

  /** Shared served-hybrid oracle (t51 and t54 — same math, different
    * vector-leg storage on the Spark side): replays the t40 BM25 CTEs
    * (serve == batch bit-identically), the IVF serve from the named
    * persisted centroid artifact, and the BIGINT fusion. */
  private def hybridServedSql(centArtifact: String): String = {
    val qMod = HsQMod
    val qRem = HsQRem
    val positions = HsPositions
    val kLeg = HsKLeg
    val k = HsK
    val nprobe = HsNprobe
    val kap = graft.operators.Hybrid.RrfKappa
    val scale = graft.operators.Hybrid.RrfScale
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |q AS (SELECT DISTINCT doc_id AS qid, t FROM (
         |  SELECT w.doc_id, unnest([${positions.map(p => s"w[$p]").mkString(", ")}]) AS t
         |  FROM w JOIN embeddings e ON e.vec_id = w.doc_id
         |  WHERE w.doc_id % $qMod = $qRem)),
         |qt AS (SELECT DISTINCT t FROM q),
         |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |       FROM (SELECT doc_id, unnest(w) AS t FROM w) JOIN qt USING (t)
         |       GROUP BY doc_id, t),
         |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
         |kept AS (SELECT t, df FROM dfreq CROSS JOIN st
         |         WHERE df * ${Bm25.PruneDfDen} < n * ${Bm25.PruneDfNum}),
         |sc AS (SELECT q.qid, tf.doc_id,
         |        CAST(floor((((n - df + 0.5e0) / (df + 0.5e0)) * (tf * ${Bm25.K1Plus1}e0) /
         |          (tf + ${Bm25.K1}e0 * (${Bm25.OneMinusB}e0 + ${Bm25.B}e0 * (dl / avgdl))))
         |          * 1000000.0e0) AS BIGINT) AS s
         |       FROM tf JOIN kept USING (t) JOIN dl USING (doc_id) CROSS JOIN st JOIN q USING (t)),
         |lexagg AS (SELECT qid, doc_id, CAST(sum(s) AS BIGINT) AS score
         |           FROM sc GROUP BY qid, doc_id),
         |lex AS (SELECT qid, doc_id,
         |          CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |        FROM lexagg WHERE doc_id <> qid),
         |cent AS (SELECT cent_id, cvec FROM ${Embedding.artifact(centArtifact)}),
         |assign AS (
         |  SELECT vec_id, embedding, cent_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cent_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${Embedding.sqlCosine("e.embedding", "c.cvec")} DESC, c.cent_id) AS rn
         |    FROM embeddings e, cent c)
         |  WHERE rn = 1),
         |qv AS (SELECT e.vec_id AS qid, e.embedding AS qvec
         |       FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
         |       WHERE e.vec_id % $qMod = $qRem),
         |probe AS (
         |  SELECT qid, cent_id FROM (
         |    SELECT qv.qid, c.cent_id,
         |           row_number() OVER (PARTITION BY qv.qid
         |             ORDER BY ${Embedding.sqlCosine("qv.qvec", "c.cvec")} DESC, c.cent_id) AS rn
         |    FROM qv, cent c)
         |  WHERE rn <= $nprobe),
         |vecscored AS (
         |  SELECT p.qid, a.vec_id AS doc_id,
         |         ${Embedding.sqlCosine("qv.qvec", "a.embedding")} AS cosine
         |  FROM probe p JOIN qv USING (qid) JOIN assign a USING (cent_id)
         |  WHERE a.vec_id <> p.qid),
         |vec AS (SELECT qid, doc_id,
         |          CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank
         |        FROM vecscored),
         |contrib AS (
         |  SELECT qid, doc_id, $scale // ($kap + rank) AS c FROM lex WHERE rank <= $kLeg
         |  UNION ALL
         |  SELECT qid, doc_id, $scale // ($kap + rank) AS c FROM vec WHERE rank <= $kLeg),
         |fused AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS rrf
         |          FROM contrib GROUP BY qid, doc_id)
         |SELECT qid, doc_id, rrf, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT qid, doc_id, rrf,
         |         row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rank
         |  FROM fused)
         |WHERE rank <= $k
         |ORDER BY qid, rank""".stripMargin
  }

  private def hybridQueryDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), docs("text"), emb("embedding"))
      .filter(col("doc_id") % HsQMod === HsQRem)
  }

  val t51HybridServed: Q = Q(
    "t51_hybrid_served",
    hybridServedSql("t51_centroids")) { (s, d) =>
    val w = graft.functions.TextFunctions.tokens(col("text"))
    val q = hybridQueryDocs(s, d)
    val qTerms = q.select(col("doc_id").as("qid"),
      explode(array(HsPositions.map(p => element_at(w, p)): _*)).as("term"))
    val qVecs = q.select(col("doc_id").as("qid"), col("embedding").as("qvec"))
    val lexLeg = graft.operators.Hybrid.dropSelf(
      Bm25.serveTopK(s, bm25Index(s, d), qTerms, HsKLeg + 1), HsKLeg)
    val (ivfDir, cents) = Embedding.ivfServedIndex(s, d)
    Embedding.writeCentroids(s, "t51_centroids", cents)
    val index = s.read.parquet(ivfDir).withColumn("cell", col("cell").cast("int"))
    val vecLeg = graft.operators.Ann
      .ivfTopKAssigned(index, qVecs, cents, HsKLeg, HsNprobe)
      .select(col("qid"), col("cid").as("doc_id"), col("rank"))
    graft.operators.Hybrid.rrfFuse(
        Seq(lexLeg.select(col("qid"), col("doc_id"), col("rank")), vecLeg), HsK)
      .orderBy(col("qid"), col("rank"))
  }

  /** Build-once cache of the COMMITTED IVF index over the embeddings
    * table (t54): v11/t51's frozen inverted file, re-homed on the
    * versioned-manifest lifecycle with the same trained centroids, so
    * [[graft.operators.Hybrid.servedTopK]] can serve its vector leg
    * from committed cells. */
  private val ivfCommittedCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, Array[Array[Float]])]

  private def ivfCommittedIndex(s: org.apache.spark.sql.SparkSession,
      d: String): (String, Array[Array[Float]]) =
    ivfCommittedCache.getOrElseUpdate(d, {
      val (_, cents) = Embedding.ivfServedIndex(s, d)
      val dir = s"/tmp/graft_ivf_committed_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      graft.operators.Ann.ivfIndexBuild(
        Tables.embeddings(s, d).select(col("vec_id").as("cid"),
          col("embedding").as("cvec")), dir, cents)
      (dir, cents)
    })

  /** Hybrid retrieval served ENTIRELY from the standing committed
    * indexes ([[graft.operators.Hybrid.servedTopK]]) — t51 composes
    * the legs by hand from the term-bucketed BM25 index and a frozen
    * inverted file; this row exercises the packaged one-call shape
    * whose vector leg probes the COMMITTED IVF index (manifest-pinned
    * cells, the v19 lifecycle). Same oracle math as t51: the fused
    * output must be identical whether the inverted file is frozen
    * parquet or committed cells. */
  val t54HybridIndexed: Q = Q(
    "t54_hybrid_indexed",
    hybridServedSql("t54_centroids")) { (s, d) =>
    val w = graft.functions.TextFunctions.tokens(col("text"))
    val q = hybridQueryDocs(s, d)
    val qRows = q.select(col("doc_id").as("qid"),
      explode(array(HsPositions.map(p => element_at(w, p)): _*)).as("term"),
      col("embedding").as("qvec"))
    val (ivfDir, cents) = ivfCommittedIndex(s, d)
    Embedding.writeCentroids(s, "t54_centroids", cents)
    graft.operators.Hybrid.servedTopK(s, bm25Index(s, d), ivfDir, qRows,
        HsKLeg, HsK, HsNprobe)
      .orderBy(col("qid"), col("rank"))
  }

  /** Mixture-rate planner ([[graft.operators.Layout.mixtureRates]]):
    * integer per-source sampling plan from target percents + a token
    * budget — target tokens, per-mille gate rate, and the REPORTED
    * deficit for sources that cannot fill their slice (the
    * epoch-upsample handoff). Budget sized so the corpus exhibits all
    * three regimes: capped-at-1000, fractional rate, and deficit. */
  val t53MixtureRates: Q = {
    val budget = 10000L
    val targets = Map("src0" -> 55, "src1" -> 2)
    val defaultPct = 10
    Q(
      "t53_mixture_rates",
      s"""WITH st AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |pl AS (
         |  SELECT source, n_docs, n_tokens,
         |         ($budget * CASE source WHEN 'src0' THEN 55 WHEN 'src1' THEN 2
         |                    ELSE $defaultPct END) // 100 AS target_tokens
         |  FROM st)
         |SELECT source, n_docs, n_tokens, target_tokens,
         |       CASE WHEN n_tokens = 0 THEN 0
         |            ELSE least(1000, (target_tokens * 1000) // n_tokens) END AS rate_permille,
         |       greatest(0, target_tokens - n_tokens) AS deficit
         |FROM pl
         |ORDER BY source""".stripMargin) { (s, d) =>
      graft.operators.Layout.mixtureRates(Tables.documents(s, d),
          "doc_id", "text", "source", targets, defaultPct, budget)
        .orderBy(col("source"))
    }
  }

  /** The UPSERT oracle's corpus: docs with doc_id % 8 = 5 replaced by a
    * 'upd '-prefixed text (old term set out, new set in — one extra
    * token shifts dl and df), and a 'fresh '-prefixed copy of the same
    * slice re-ingested under NEW ids (+10⁶ — the plain-insert half).
    * Rendered identically as a DuckDB FROM-subquery and as the Spark
    * batch below. */
  private val UpsertCorpusSql =
    """(SELECT doc_id,
      |        CASE WHEN doc_id % 8 = 5 THEN 'upd ' || text ELSE text END AS text
      | FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, 'fresh ' || text AS text
      | FROM documents WHERE doc_id % 8 = 5) ups""".stripMargin

  private def upsertedCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.withColumn("text",
        when(col("doc_id") % 8 === 5, concat(lit("upd "), col("text")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 8 === 5)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("fresh "), col("text")).as("text")))
  }

  /** Build-then-UPSERT cache backing [[t59Bm25Upsert]]: index built on
    * the FULL corpus, then ONE refresh tick ([[Bm25.upsertIndex]])
    * replaces the doc_id % 8 = 5 slice with modified text AND inserts
    * the same texts under brand-new ids — the replace half exercises
    * the old-copy removal (docmap locate, bucket rewrite, stats roll),
    * the insert half the plain-append path, in one commit. */
  private val bm25UpsertCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25UpsertedIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25UpsertCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val dir = s"/tmp/graft_bm25_upsert_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(docs, "doc_id", "text", dir)
      val slice = docs.filter(col("doc_id") % 8 === 5)
      Bm25.upsertIndex(s, dir,
        slice.select(col("doc_id"), concat(lit("upd "), col("text")).as("text"))
          .unionByName(slice.select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("fresh "), col("text")).as("text"))),
        "doc_id", "text")
      dir
    })

  /** Standing-BM25-index UPSERT tick ([[Bm25.upsertIndex]]) — the
    * REFRESH verb: replace-or-insert in ONE crash-atomic commit (t50
    * grows the index, t56/t57 shrink it, this CORRECTS it). The oracle
    * is the one-shot index over the modified corpus — a surviving old
    * posting, a missing new one, stale df anywhere, or a mis-rolled
    * (n, sdl) after the refresh breaks the hash (upsert == rebuild
    * over (corpus − batch ids) ∪ batch). */
  val t59Bm25Upsert: Q = Q(
    "t59_bm25_upsert",
    bm25BatchSql(mod = 100, rem = 45, positions = Seq(1, 3, 7), k = 6,
      corpusFrom = UpsertCorpusSql)) { (s, d) =>
    Bm25.serveTopK(s, bm25UpsertedIndex(s, d),
        bm25Queries(upsertedCorpus(s, d), 100, 45, Seq(1, 3, 7)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** The CDC oracle's corpus after ONE mixed change batch: the
    * doc_id % 9 = 7 slice DELETED, the surviving doc_id % 8 = 5 slice
    * REPLACED by 'upd '-prefixed text, and a 'fresh '-prefixed copy of
    * that replaced slice INSERTED under new ids (+10⁶). Rendered
    * identically as a DuckDB FROM-subquery and as the Spark change
    * batch below (the slices are disjoint — delete wins the overlap by
    * construction, so no id carries both ops). */
  private val CdcCorpusSql =
    """(SELECT doc_id,
      |        CASE WHEN doc_id % 8 = 5 THEN 'upd ' || text ELSE text END AS text
      | FROM documents WHERE doc_id % 9 <> 7
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, 'fresh ' || text AS text
      | FROM documents WHERE doc_id % 8 = 5 AND doc_id % 9 <> 7) chg""".stripMargin

  private def cdcCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val kept = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 9 =!= 7)
    kept.withColumn("text",
        when(col("doc_id") % 8 === 5, concat(lit("upd "), col("text")))
          .otherwise(col("text")))
      .unionByName(kept.filter(col("doc_id") % 8 === 5)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("fresh "), col("text")).as("text")))
  }

  /** Build-then-APPLY cache backing [[t60Bm25Cdc]]: index built on the
    * FULL corpus, then ONE mixed change batch
    * ([[Bm25.applyChanges]]) — deletes, replacements and inserts in a
    * single crash-atomic commit, the CDC maintenance shape. */
  private val bm25CdcCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def bm25CdcIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    bm25CdcCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val dir = s"/tmp/graft_bm25_cdc_${ProcessHandle.current().pid()}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      Bm25.buildIndex(docs, "doc_id", "text", dir)
      val slice = docs.filter(col("doc_id") % 8 === 5 && col("doc_id") % 9 =!= 7)
      val changes =
        slice.select(lit("upsert").as("op"), col("doc_id"),
            concat(lit("upd "), col("text")).as("text"))
          .unionByName(slice.select(lit("upsert").as("op"),
            (col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("fresh "), col("text")).as("text")))
          .unionByName(docs.filter(col("doc_id") % 9 === 7)
            .select(lit("delete").as("op"), col("doc_id"),
              lit(null).cast("string").as("text")))
      Bm25.applyChanges(s, dir, changes, "op", "doc_id", "text")
      dir
    })

  /** Standing-BM25-index CHANGE-APPLY tick ([[Bm25.applyChanges]]) —
    * the CDC verb: one MIXED batch of deletes, replacements and
    * inserts folds in a single crash-atomic commit (what a
    * change-capture maintenance stream delivers per epoch). The oracle
    * is the one-shot index over the post-change corpus — a surviving
    * deleted posting, an un-replaced text, a lost insert, stale df or
    * a mis-rolled (n, sdl) anywhere breaks the hash. */
  val t60Bm25Cdc: Q = Q(
    "t60_bm25_cdc",
    bm25BatchSql(mod = 100, rem = 27, positions = Seq(2, 5, 8), k = 6,
      corpusFrom = CdcCorpusSql)) { (s, d) =>
    Bm25.serveTopK(s, bm25CdcIndex(s, d),
        bm25Queries(cdcCorpus(s, d), 100, 27, Seq(2, 5, 8)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  /** TIME-TRAVEL serve ([[Bm25.serveTopKVersion]]): t50's
    * build-then-append index serves AS OF version 1 — the
    * pre-append state. The oracle is the one-shot index over the
    * INITIAL corpus only (doc_id % 3 ≠ 2, t50's split): a time-travel
    * read that leaked any post-tick posting, df or stats value — or
    * resolved the wrong manifest — breaks the hash. Queries also
    * derive from the initial slice (the version-1 corpus is what a
    * version-1 reader knew). */
  val t61Bm25Version: Q = Q(
    "t61_bm25_version",
    bm25BatchSql(mod = 100, rem = 61, positions = Seq(2, 4, 9), k = 6,
      corpusWhere = "doc_id % 3 <> 2")) { (s, d) =>
    val initial = Tables.documents(s, d).filter(col("doc_id") % 3 =!= 2)
    Bm25.serveTopKVersion(s, bm25AppendedIndex(s, d), 1L,
        bm25Queries(initial, 100, 61, Seq(2, 4, 9)), k = 6)
      .orderBy(col("qid"), col("rank"))
  }

  val all: Seq[Q] = Seq(t17SpanDedup, t18Bm25, t19BigramLm, t20LeakfreeSplit,
    t21ShardLayout, t22SourceMix, t24QualityModel, t25UrlCanon, t26TempSample,
    t27BpePairs, t28PplBuckets, t31NgramDecontam, t32SpanCut, t33PageRank,
    t34PhraseTags, t35Boilerplate, t36EpochUpsample, t37DsirSelect,
    t38StratifiedEval, t40Bm25Batch, t41Bm25Served, t48HybridRrf,
    t50Bm25Append, t51HybridServed, t53MixtureRates, t54HybridIndexed,
    t55Bm25Profile, t56Bm25Delete, t57Bm25DeleteIds, t59Bm25Upsert,
    t60Bm25Cdc, t61Bm25Version, t63Bm25TakedownChain, t64Bm25Export)
}
