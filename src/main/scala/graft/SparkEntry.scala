package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Corpus, Embedding, Extras, Protocol, Protocol2, Protocol3, Protocol4, Q, Relational, Text, XmlExtract}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (or its testdata analog per
  * FIXTURES.md §B) is declared here as a named query; those with an
  * `oracle` are hash-checked against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** All declared queries, in registration order. */
  def allQueries: Seq[Q] =
    Relational.all ++ Text.all ++ Corpus.all ++ Embedding.all ++ Extras.all ++ XmlExtract.all ++
      Protocol.all ++ Protocol2.all ++ Protocol3.all ++ Protocol4.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
