package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast multi-phrase tagging — the blocklist / topic-lexicon pass a
  * curation pipeline runs over every document (bad-word filtering,
  * domain tagging, compliance lexicons; the FlashText/Aho-Corasick use
  * case). The phrase list is driver-sized by definition and ships as a
  * broadcast; each document pays ONE narrow pass that scans for all
  * phrases — no shuffle of the corpus, no per-phrase scans.
  *
  * Counting semantics: NON-OVERLAPPING occurrences, scanned
  * left-to-right per phrase (`indexOf` stepping past each match) —
  * exactly SQL's `(len(text) - len(replace(text, p, ''))) / len(p)`,
  * which is what the oracle computes. Case-sensitive, raw substring
  * (callers lowercase/normalize first if needed — compose with the
  * quality pass).
  */
object Phrases {

  /** Non-overlapping occurrence count of `phrase` in `text`. */
  private[operators] def countOccurrences(text: String, phrase: String): Long = {
    var n = 0L
    var i = text.indexOf(phrase)
    while (i >= 0) {
      n += 1
      i = text.indexOf(phrase, i + phrase.length)
    }
    n
  }

  /** One row per (doc, phrase) with at least one hit: (doc_id, phrase,
    * n_hits). Docs with no hits emit nothing — the common case at
    * corpus scale, so the output is bounded by actual matches. */
  def tag(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phrase list must be non-empty, with no empty phrases")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(phrases.toArray)
    // NULL text yields no hits (matches the oracle, where LIKE/replace
    // over NULL is NULL): filter before the typed pass — this is a
    // user-facing TVF over arbitrary parquet, so nulls are expected.
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        bc.value.iterator.flatMap { p =>
          val n = countOccurrences(text, p)
          if (n > 0) Some((id, p, n)) else None
        }
      }
      .toDF("doc_id", "phrase", "n_hits")
  }
}
