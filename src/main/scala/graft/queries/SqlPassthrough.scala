package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-passthrough surface (SURVEY §7.2 step 6): the fixture tables
  * registered as views and queried with ONE ANSI SQL string that both
  * Catalyst and DuckDB execute verbatim — the literal "switch engines,
  * keep the query" guarantee. The oracle IS the Spark query text.
  */
object SqlPassthrough {

  private def run(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** Shared ANSI text — parsed by both engines unchanged. */
  val RegionRevenueSql: String =
    """SELECT r_name,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  val TopPartsSql: String =
    """SELECT p_brand, p_type,
      |  CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts,
      |  CAST(min(p_size) AS BIGINT) AS min_size,
      |  CAST(max(p_size) AS BIGINT) AS max_size
      |FROM part
      |WHERE p_size BETWEEN 10 AND 20
      |GROUP BY p_brand, p_type
      |HAVING count(*) > 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("sql_region_revenue", RegionRevenueSql)((s, dir) => run(s, dir, RegionRevenueSql)),
    Q("sql_part_stats", TopPartsSql)((s, dir) => run(s, dir, TopPartsSql)))
}
