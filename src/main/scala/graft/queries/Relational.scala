package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface over the TPC-H-ish fixture tables.
  *
  * The reference (jnkroeker/chyme) has no relational operators at all
  * (SURVEY.md §2.9) — this module is the structured-query surface our
  * engine adds, all Catalyst built-ins, every query validated against the
  * DuckDB oracle.
  *
  * Float policy: double aggregates are order-dependent across engines, so
  * every SUM/AVG of a double is rounded (2 dp for money, 4–6 dp for
  * ratios) on BOTH sides; pointwise double arithmetic is IEEE-identical
  * and left unrounded. Integer-ish outputs are cast to BIGINT on both
  * sides so dtypes agree.
  *
  * Scale notes (100 TB design): every query below is a declarative plan —
  * filters/projections push to the parquet scan, aggregates run
  * partial+final. Broadcast hints appear ONLY on tables of constant
  * cardinality (region=5, nation=25). customer/supplier/part scale
  * linearly with SF (~1.5e9/1e8/2e9 rows at 100 TB) so their join
  * strategy is left to AQE, which broadcasts when the runtime size is
  * under the threshold and falls back to shuffle join when it is not.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Seq[Q] = Seq(

    // ── Scan + filter + group-agg (TPC-H Q1 shape) ──────────────────────
    Q(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2)                                        AS sum_qty,
        |  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
        |  round(avg(l_quantity), 4)                                        AS avg_qty,
        |  round(avg(l_extendedprice), 4)                                   AS avg_price,
        |  round(avg(l_discount), 6)                                        AS avg_disc,
        |  count(*)                                                         AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }.copy(bench = true),

    // ── Selective filter + global agg (TPC-H Q6 shape; pushdown check) ──
    Q(
      "q2_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }.copy(bench = true),

    // ── 4-way star join + agg: revenue by nation ────────────────────────
    // nation (25 rows, constant) is broadcast; customer scales with SF so
    // AQE picks its strategy. lineitem→orders shuffles (both sides large).
    Q(
      "q3_revenue_by_nation",
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }.copy(bench = true),

    // ── Semi join with non-equi conjunct (EXISTS; TPC-H Q4 shape) ───────
    Q(
      "q4_priority_semi_join",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // ── Anti join (NOT EXISTS) ──────────────────────────────────────────
    Q(
      "q5_customers_without_big_orders",
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },

    // ── Sort + limit (top-k) with deterministic tie-break ───────────────
    Q(
      "q6_top_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(25)
    },

    // ── Ranking window: top-3 customers per nation by balance ───────────
    Q(
      "q7_top_customers_per_nation",
      """SELECT n_name, c_custkey, c_acctbal, rk
        |FROM (
        |  SELECT n_name, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY n_name
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) ranked
        |WHERE rk <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("n_name")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"), col("rk"))
    }.copy(bench = true),

    // ── Running-total window (cumulative frame) ─────────────────────────
    // l_quantity is integral-valued, so the running double sum is exact on
    // both engines regardless of DuckDB's segment-tree evaluation.
    // ORDER BY must be a TOTAL order: sf0.1 contains duplicate
    // (suppkey, shipdate, orderkey, linenumber) rows with different
    // quantities, and a ROWS cumulative over an ambiguous order is
    // engine-dependent — quantity/extendedprice complete the tie-break.
    Q(
      "q8_running_quantity",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("running_qty"))
    },

    // ── Analytic windows: lag/lead over per-customer order history ──────
    Q(
      "q9_order_gaps",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
    },

    // ── Set operators ───────────────────────────────────────────────────
    Q(
      "q10_union_nations",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    },
    Q(
      "q11_except_nations",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },
    Q(
      "q12_intersect_nations",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },

    // ── Rollup / cube / grouping sets ───────────────────────────────────
    Q(
      "q13_rollup_flag_status",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    },
    Q(
      "q14_cube_flag_status",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    },

    // ── Distinct aggregates ─────────────────────────────────────────────
    Q(
      "q15_distinct_parts_per_flag",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_supps,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n"))
    },

    // ── Group + HAVING ──────────────────────────────────────────────────
    Q(
      "q16_frequent_customers",
      """SELECT o_custkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_spend
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 5""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_spend"))
        .filter(col("n_orders") >= 5)
    },

    // ── Conditional aggregation (CASE WHEN inside agg) ──────────────────
    Q(
      "q17_conditional_agg",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)        AS n_high_disc,
        |  round(sum(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END), 2)  AS rev_big_qty
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).cast("long").as("n_high_disc"),
          round(sum(when(col("l_quantity") > 25, col("l_extendedprice")).otherwise(0)), 2).as("rev_big_qty"))
    },

    // ── Scalar string functions ─────────────────────────────────────────
    Q(
      "q18_string_functions",
      """SELECT c_custkey,
        |  upper(c_name)                 AS uname,
        |  substr(c_name, 1, 8)          AS prefix8,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS seg_nat
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        length(col("c_name")).cast("long").as("name_len"),
        concat(col("c_mktsegment"), lit("-"), col("c_nationkey").cast("string")).as("seg_nat"))
    },

    // ── Scalar date functions ───────────────────────────────────────────
    Q(
      "q19_orders_by_month",
      """SELECT CAST(year(o_orderdate) AS BIGINT)  AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    },

    // ── Scalar math functions (pointwise — IEEE-exact, no rounding;
    //    round() on half-way doubles differs between engines) ───────────
    Q(
      "q20_math_functions",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS net_price,
        |  CAST(floor(l_quantity / 7) AS BIGINT)  AS qty_bucket,
        |  abs(l_discount - 0.05)                 AS disc_dist,
        |  CAST(ceil(l_tax * 100) AS BIGINT)      AS tax_pct
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        floor(col("l_quantity") / 7).cast("long").as("qty_bucket"),
        abs(col("l_discount") - 0.05).as("disc_dist"),
        ceil(col("l_tax") * 100).cast("long").as("tax_pct"))
    },

    // ── Wide star join: part × supplier dimensions ──────────────────────
    Q(
      "q21_brand_supplier_volume",
      """SELECT p_brand, s_name, count(*) AS n,
        |       round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_name""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"), col("s_name"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    }.copy(bench = true),

    // ── Grouping sets (SQL passthrough surface) ─────────────────────────
    Q(
      "q22_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    // ── Correlated scalar-subquery shape: above-average order lines ─────
    // Expressed as a window avg over l_partkey: ONE shuffle on the part
    // key and nothing materialized driver-side. The self-join alternative
    // would shuffle lineitem twice (once for the agg, once for the join);
    // broadcasting the per-partkey agg would collect |part|-cardinality
    // rows to the driver — unbounded at scale.
    Q(
      "q23_above_avg_lines",
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
        |FROM lineitem l
        |JOIN (SELECT l_partkey, avg(l_quantity) AS aq
        |      FROM lineitem GROUP BY l_partkey) p
        |  ON l.l_partkey = p.l_partkey
        |WHERE l.l_quantity > 1.5 * p.aq""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_partkey"))
      t(s, dir, "lineitem")
        .withColumn("aq", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") > lit(1.5) * col("aq"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    // ── Skew-safe cumulative aggregation (q8's scale-path variant) ──────
    // q8's per-row window partitions by l_suppkey: with few suppliers and
    // billions of lines, one partition = one giant sorted task. The
    // pre-aggregated form below computes per-(supplier, month) partial
    // sums FIRST (a partial+final hash agg — fully parallel), then runs
    // the cumulative window over supplier×month — cardinality |suppliers|
    // × |months|, thousands of times smaller than lineitem and bounded
    // regardless of data volume. This is the coarse-grained prefix-sum
    // pattern a 100 TB cumulative report actually uses.
    Q(
      "q24_running_qty_bucketed",
      """SELECT l_suppkey, month,
        |  sum(month_qty) OVER (PARTITION BY l_suppkey ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM (SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS month,
        |        sum(l_quantity) AS month_qty
        |      FROM lineitem GROUP BY 1, 2)""".stripMargin) { (s, dir) =>
      val monthly = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(sum(col("l_quantity")).as("month_qty"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.select(col("l_suppkey"), col("month"),
        sum(col("month_qty")).over(w).as("running_qty"))
    },

    // ── Pivot: long → wide reshaping (groupBy().pivot().agg()) ──────────
    // The pivoted column set is declared explicitly — at scale an
    // implicit pivot would first run a distinct scan over the pivot
    // column AND make the output schema data-dependent; with literal
    // values it's a single partial+final hash agg with conditional
    // sums, which is also exactly how the oracle expresses it.
    Q(
      "q25_pivot_status_by_flag",
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o,
        |  CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
        |  CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot(col("l_linestatus"), Seq("F", "O"))
        .agg(
          round(sum(coalesce(col("l_quantity"), lit(0.0))), 2).as("qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          coalesce(col("F_qty"), lit(0.0)).as("qty_f"),
          coalesce(col("O_qty"), lit(0.0)).as("qty_o"),
          coalesce(col("F_n"), lit(0L)).as("n_f"),
          coalesce(col("O_n"), lit(0L)).as("n_o"))
    },

    // ── Ranking-window family: ntile quartiles and percent_rank within
    // per-nation partitions (the remaining window shapes q7/q8/q24
    // don't cover). Ties broken by custkey so bucket boundaries are
    // deterministic; percent_rank is exact rational arithmetic, so no
    // rounding is needed. Per-nation windows, never a global sort. ─────
    Q(
      "q26_balance_quartiles",
      """SELECT c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"))
    })
}
