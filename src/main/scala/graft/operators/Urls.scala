package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-crawl curation step that collapses
  * scheme/host case noise, default ports, tracking parameters,
  * fragments and trailing slashes before URL-level dedup. Pure
  * codegen'd string expressions (no UDF), so the canonical key is
  * computed in the scan task and only (key, id) rows reach the dedup
  * groupBy.
  *
  * Cross-engine note: the same regexes run verbatim in the DuckDB
  * oracle, so every pattern stays inside the RE2 ∩ java.util.regex
  * intersection — no backreferences in replacements (DuckDB spells
  * them `\1`, Java `$1`) and no lookbehind (absent from RE2). The
  * default-port strip therefore anchors `:443$`/`:80$` on the
  * EXTRACTED scheme://host prefix instead of looking behind in the
  * full URL. */
object Urls {

  /** Canonical form of a URL column:
    *   1. drop the `#fragment`;
    *   2. lowercase the scheme://host[:port] prefix (path case is
    *      significant and preserved);
    *   3. strip the scheme's default port (`:443` for https, `:80`
    *      for http);
    *   4. drop a tracking-only query string (`?utm_...`);
    *   5. drop a trailing slash. */
  def canonicalize(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val rawPre = regexp_extract(nofrag, "^[A-Za-z]+://[^/]+", 0)
    val pre = lower(rawPre)
    val scheme = regexp_extract(pre, "^[a-z]+", 0)
    val noport =
      when(scheme === "https", regexp_replace(pre, ":443$", ""))
        .when(scheme === "http", regexp_replace(pre, ":80$", ""))
        .otherwise(pre)
    val rest = nofrag.substr(length(rawPre) + 1, length(nofrag))
    val noutm = regexp_replace(concat(noport, rest), "\\?utm_.*$", "")
    regexp_replace(noutm, "/$", "")
  }

  /** Bloom blocklist gate — the crawl-frontier / ingestion filter for a
    * reference URL set too large to broadcast exactly (a 10⁸-URL
    * blocklist is ~125 MB at 10 bits/entry vs several GB as an exact
    * set). The filter is built DISTRIBUTED by Spark's own sketch
    * (`df.stat.bloomFilter` — per-partition filters OR-merged, so
    * insertion order is irrelevant and the bit array is deterministic),
    * ships once as a broadcast, and gating is a narrow `might_contain`
    * scan — works identically on a batch frame or a streaming one
    * (stateless, like [[graft.streaming.CrossDedupStream]]).
    *
    * Semantics: NO false negatives — every canonicalized reference URL
    * is dropped with certainty; a tunable `fpp` fraction of clean URLs
    * is over-dropped (the right direction for a blocklist). Both sides
    * are canonicalized with [[canonicalize]] so cosmetic variants of a
    * blocked URL are blocked too. */
  def bloomGate(docs: DataFrame, urlCol: String, reference: DataFrame,
      refUrlCol: String, expectedRefSize: Long, fpp: Double = 0.01): DataFrame = {
    val canonRef = reference.select(canonicalize(col(refUrlCol)).as("__u"))
      .filter(col("__u").isNotNull) // a null reference URL blocks nothing
    val bloom = canonRef.stat.bloomFilter("__u", expectedRefSize, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    // the sketch probe has no Catalyst expression (util.sketch filters
    // are not the BloomFilterAggregate format), so the gate is a typed
    // row filter — the canonical key itself is still computed by the
    // codegen'd expression chain; null URLs pass (nothing to block)
    val withKey = docs.withColumn("__u", canonicalize(col(urlCol)))
    val idx = withKey.schema.fieldIndex("__u")
    withKey
      .filter { r: org.apache.spark.sql.Row =>
        r.isNullAt(idx) || !bc.value.mightContainString(r.getString(idx))
      }
      .drop("__u")
  }
}
