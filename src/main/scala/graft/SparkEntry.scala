package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared query from the operator modules. Each module
  * exposes `queries: Seq[Q]`; a `Q` pairs the Spark implementation with
  * its DuckDB oracle SQL (when SQL-expressible).
  */
object SparkEntry {

  /** All declared queries, in module order. */
  lazy val allQueries: Seq[Q] =
    queries0.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset timed by Bench. */
  def benchQueries: Seq[Q] = allQueries.filter(_.bench)
}
