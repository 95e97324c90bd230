package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. The driver hash-compares the two at
  * sf0.01 — column names must match exactly on both sides.
  *
  * @param bench whether this query is part of the headline bench set
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Q {
  /** Oracle-checked query. */
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  /** Rows-only query (semantics not expressible in portable ANSI SQL). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
