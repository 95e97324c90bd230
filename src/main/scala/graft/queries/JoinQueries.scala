package graft.queries

import graft.{Q, Tables}
import graft.operators.{AsOfJoin, SkewJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-join operators over `events`: as-of join (union-window
  * implementation vs DuckDB's native ASOF JOIN as the oracle), a
  * key-bounded range join, and exact interpolated percentiles.
  */
object JoinQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** ONE rendering of the range-join oracle — shared with the
    * stream-stream twin (stream_range_join), so the two can't drift. */
  val rangeJoinSql: String =
    """SELECT s.event_id AS signup_id, e.event_id,
      |  CAST(date_diff('second', s.ts, e.ts) AS BIGINT) AS secs_after_signup
      |FROM events s JOIN events e
      |  ON e.user_id = s.user_id
      | AND s.event_type = 'signup' AND e.event_type <> 'signup'
      | AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── As-of join: each event enriched with the latest prior purchase ─
    // Right side deduped to one row per (user, ts) so the as-of match
    // is uniquely defined on both engines.
    Q(
      "events_asof_join",
      """WITH p AS (SELECT user_id, ts AS pts, max(value) AS pval
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, p.pts AS last_purchase_ts,
        |       p.pval AS last_purchase_value
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.pts""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max("value").as("pval"))
        .select(col("user_id"), col("pts"), col("pval"))
      AsOfJoin.asOf(
        e.select("event_id", "user_id", "ts"), purchases,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightPayload = Seq("pts", "pval"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("pts").as("last_purchase_ts"), col("pval").as("last_purchase_value"))
    },

    // ── Range join bounded by the equi key: events within 1 h of signup ─
    // The range predicate rides a user_id equi join (sort-merge on the
    // key, filter within) — never an unbounded interval cross join.
    Q("events_range_join", rangeJoinSql) { (s, dir) =>
      val ev = events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("sts"))
      val others = ev.filter(col("event_type") =!= "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      signups.join(others,
          others("user_id") === signups("user_id") &&
            col("ts") > col("sts") &&
            col("ts") <= col("sts") + expr("INTERVAL 1 HOUR"))
        .select(col("signup_id"), col("event_id"),
          (col("ts").cast("long") - col("sts").cast("long")).as("secs_after_signup"))
    },

    // ── Exact interpolated percentiles (quantile_cont ≡ percentile) ────
    Q(
      "events_percentiles",
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.95)").as("p95"),
          expr("percentile(value, 0.99)").as("p99"))
    },

    // ── Co-located bucketed join: orders and lineitem written bucketed
    // by the join key into the same bucket count join with NO exchange
    // on either side (PlanAuditSpec pins zero pre-join shuffles) — the
    // at-rest layout that makes repeated fact-table joins shuffle-free
    // at 100 TB. Results are layout-independent, so the oracle is the
    // plain join. ──────────────────────────────────────────────────────
    Q(
      "join_bucketed_colocated",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = s.table(graft.store.Bucketing.ensureBucketed(
        s, dir, "orders", "o_orderkey", 8))
      val l = s.table(graft.store.Bucketing.ensureBucketed(
        s, dir, "lineitem", "l_orderkey", 8))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    },

    // ── Salted skew join: lineitem⋈supplier with a deterministic salt
    // splitting every supplier key across 8 (key, salt) shuffle
    // partitions — the explicit hot-key defense for when AQE's skew
    // split can't re-plan the stage. The result is row-identical to the
    // unsalted join, so the oracle is the PLAIN join: any salt leakage
    // (dropped rows, duplicate replication) breaks the hash. ──────────
    Q(
      "join_skew_salted",
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_nationkey""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      SkewJoin.saltedJoin(l, sup, "suppkey", factor = 8)
        .groupBy("s_nationkey")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    })
}
