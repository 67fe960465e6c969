package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator-query in the driver contract.
  *
  * @param name   stable key, appears in CORRECTNESS_r{N}.json / BENCH_r{N}.json
  * @param doc    which SURVEY.md §2 operator(s) this exercises
  * @param oracle DuckDB-equivalent ANSI SQL over the same parquet tables;
  *               None for non-SQL-expressible ops (embedder, LSH internals)
  *               → the driver records a weaker rows-only check.
  */
final case class NamedQuery(
    name: String,
    doc: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object NamedQuery {
  def q(name: String, doc: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(name, doc, Some(oracle), fn)

  def noOracle(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(name, doc, None, fn)
}
