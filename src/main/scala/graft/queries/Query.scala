package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle == None` downgrades to a rows-only check (used for
  * operators whose semantics are not SQL-expressible, e.g. LSH recall).
  *
  * Conventions that keep the hash-compare honest:
  *   - every computed column is aliased identically on both sides;
  *   - both sides end in the same ORDER BY over a deterministic key;
  *   - monetary / arithmetic aggregates go through DECIMAL casts so the
  *     result is order-of-accumulation independent (double sums are not).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
}
