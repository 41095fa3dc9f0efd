package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / dedup building blocks for large-scale training-data
  * pipelines. All pure `Column` compositions over built-in functions —
  * whole-stage-codegen friendly, no UDFs — so the same logic is
  * re-expressible as ANSI SQL for the DuckDB oracle.
  *
  * Determinism note: every hash here is MD5-over-UTF8 (available and
  * bit-identical in Spark, DuckDB, and virtually every engine), never
  * engine-private hashes (`xxhash64` seeds differ across engines).
  */
object TextFunctions {

  /** Whitespace tokenization. `trim` first so leading/trailing blanks do
    * not produce empty tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct-token array (set semantics for Jaccard/minhash). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Text-normalization chain (the step every crawl pipeline runs before
    * hashing or tokenizing): Unicode NFC canonical composition (custom
    * codegen expression — Spark has no builtin), strip C0/DEL control
    * characters, collapse whitespace runs, trim. One narrow codegen'd
    * pass; the NFC fast path returns already-normalized (i.e. nearly
    * all) rows without allocation. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(CodecExpressions.nfc_normalize(c), "[\\x00-\\x1F\\x7F]", ""),
      "\\s+", " "))

  /** Word n-gram shingles: `"a b c d"` → `["a b c", "b c d"]` for n=3.
    * Empty array when the document has fewer than n tokens (Spark's
    * `sequence(1, 0)` would count *down*, so the guard is load-bearing). */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(o => element_at(w, (i + lit(o)).cast("int"))): _*)
    when(size(w) >= n, transform(sequence(lit(1), size(w) - (n - 1)), gram))
      .otherwise(array().cast("array<string>"))
  }

  /** SimHash bit contribution: +1/-1 depending on bit `i` of the token's
    * hash. Bit = first hex nibble of md5('<i>#' || token) < 8 — pure string
    * compare, portable to any engine with md5. */
  def simhashContrib(elem: Column, i: Int): Column =
    when(substring(md5(concat(lit(s"$i#"), elem)), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1))
      .otherwise(lit(-1))

  /** Polynomial rolling-hash fingerprint of a document: Horner evaluation
    * of codepoints, base 31, mod 2^31-1. `aggregate` keeps it inside
    * codegen; the same fold is `list_reduce` in DuckDB. */
  def fingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % 2147483647L)

  /** BPE-ish token-count estimate: ceil(chars / 4) in pure integer math. */
  def bpeEstimate(text: Column): Column = floor((length(text) + 3) / 4).cast("long")

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column = length(regexp_replace(text, "[^.!?,;:]", ""))

  /** Count of tokens (with multiplicity) that are in `words`. */
  def wordListCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))
}
