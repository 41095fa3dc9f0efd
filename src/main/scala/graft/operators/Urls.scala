package graft.operators

import org.apache.spark.sql.Column
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
}
