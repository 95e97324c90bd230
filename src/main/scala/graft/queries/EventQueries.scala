package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Event-time analytics over `events` beyond the streaming queries:
  * sessionization, sliding (hopping) windows, and JSON-props
  * extraction. All batch DataFrame plans, value-checked against DuckDB
  * (gaps-and-islands SQL, two-bucket hop expansion, json_extract).
  */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Seq[Q] = Seq(

    // ── Key-skew diagnostic: the k hottest keys with corpus share and
    // skew-vs-uniform ratio — the report that decides salting factors /
    // AQE skew thresholds BEFORE a shuffle straggles on the hot key. ───
    Q(
      "events_key_skew",
      """WITH c AS (SELECT user_id AS key, count(*) AS n_rows FROM events GROUP BY 1),
        |t AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM c)
        |SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        |  round(n_rows * 100.0 / total, 4) AS share_pct,
        |  round(n_rows * n_keys * 1.0 / total, 4) AS skew_vs_uniform
        |FROM c, t
        |ORDER BY n_rows DESC, key LIMIT 20""".stripMargin) { (s, dir) =>
      graft.operators.SkewJoin.keySkewReport(events(s, dir), "user_id", k = 20)
    },

    // ── Sessionization: 30-minute inactivity gap per user ──────────────
    // Gaps-and-islands on both sides (deterministic tie-break by
    // event_id). EventSpec separately proves the built-in
    // session_window() assigns identical session counts.
    Q(
      "events_sessionize",
      """WITH d AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_id FROM d)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      // exact-µs gap compare: cast("long") would truncate to seconds and
      // split sessions differently than the oracle's INTERVAL compare
      // for fractional gaps at the 1800 s boundary
      val gapMicros = 30L * 60 * 1000000
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          round(sum(col("value")), 4).as("total_value"))
    },

    // ── Sliding (hopping) window: 1 h windows every 30 min ─────────────
    // Spark's window(ts, 1h, 30m) generator vs DuckDB's explicit
    // two-bucket expansion — every event lands in exactly two hops.
    Q(
      "events_sliding_window",
      """SELECT w.ws AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM events,
        |  LATERAL (SELECT unnest([
        |    time_bucket(INTERVAL 30 MINUTE, ts),
        |    time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws) w
        |WHERE ts >= w.ws AND ts < w.ws + INTERVAL 1 HOUR
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
    },

    // ── D4 at scale: HLL approximate distinct (sketch, mergeable) ──────
    // Not oracle-bound (HLL estimates are engine-specific); EventSpec
    // pins the relative error against the exact count.
    Q.rowsOnly("events_approx_distinct") { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n"))
    },

    // ── Deterministic HLL: the same estimator with md5-derived
    // registers — the count-min precedent applied to distinct
    // counting, so THIS sketch row is fully oracle-bound (DuckDB
    // recomputes registers and estimate value-for-value; integer-only
    // nibble logic + an exact-in-f64 harmonic sum make the match
    // bit-exact, not approximate — see operators/Hll.scala). The
    // native engine-seeded row above stays as the built-in surface. ───
    Q(
      "events_approx_distinct_det",
      EventQueries.hllOracleSql) { (s, dir) =>
      graft.operators.Hll.approxDistinct(
        events(s, dir), Seq("event_type"), col("user_id"))
    },

    // ── Percentiles at scale: the KLL/GK-style sketch form of
    // events_percentiles. Exact `percentile` holds every value per
    // group; `percentile_approx` is a bounded-memory mergeable sketch —
    // the only form that survives 100 TB groups. Not oracle-bound
    // (sketch internals are engine-specific); EventSpec pins the rank
    // error against the exact interpolated percentiles. ───────────────
    Q.rowsOnly("events_percentiles_approx") { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(
          expr("percentile_approx(value, 0.5, 1000)").as("p50"),
          expr("percentile_approx(value, 0.95, 1000)").as("p95"),
          expr("percentile_approx(value, 0.99, 1000)").as("p99"))
    },

    // ── JSON props extraction: from_json into typed columns ────────────
    Q(
      "events_props_json",
      """SELECT event_type,
        |  CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS k_sum,
        |  CAST(max(json_extract(props, '$.k')::INT) AS BIGINT) AS k_max,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val schema = StructType(Seq(StructField("k", IntegerType)))
      events(s, dir)
        .withColumn("p", from_json(col("props"), schema))
        .groupBy("event_type")
        .agg(sum(col("p.k")).cast("long").as("k_sum"),
          max(col("p.k")).cast("long").as("k_max"),
          count(lit(1)).as("n"))
    },

    // ── Funnel: view → click → purchase, strictly ordered per user ─────
    // Step N counts users whose earliest step-N event follows their
    // earliest step-(N−1) completion — the standard ordered-funnel
    // semantics. One row out; each step is a groupBy + join, no window
    // over the full event stream.
    Q(
      "events_funnel",
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(count(s1.user_id) AS BIGINT) AS n_view,
        |       CAST(count(s2.user_id) AS BIGINT) AS n_view_click,
        |       CAST(count(s3.user_id) AS BIGINT) AS n_view_click_purchase
        |FROM s1
        |LEFT JOIN s2 ON s2.user_id = s1.user_id
        |LEFT JOIN s3 ON s3.user_id = s1.user_id""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      def firstAfter(typ: String, prev: DataFrame, prevTs: String, as: String): DataFrame =
        ev.filter(col("event_type") === typ)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevTs))
          .groupBy("user_id").agg(min(col("ts")).as(as))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = firstAfter("click", s1, "t1", "t2")
      val s3 = firstAfter("purchase", s2, "t2", "t3")
      s1.join(s2.select(col("user_id"), lit(1).as("hit2")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), lit(1).as("hit3")), Seq("user_id"), "left")
        .agg(count(col("user_id")).as("n_view"),
          count(col("hit2")).as("n_view_click"),
          count(col("hit3")).as("n_view_click_purchase"))
    },

    // ── Retention cohorts: first-seen week × active-week offset ────────
    // The cohort heat-map input. Week truncation is Monday-based on
    // both engines; the offset divides exact 7-day multiples of
    // week-truncated dates, so values are integer on both sides.
    Q(
      "events_retention",
      """WITH first AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id,
        |          date_trunc('week', f.first_ts) AS cohort_week,
        |          (datediff('day', CAST(date_trunc('week', f.first_ts) AS DATE),
        |                    CAST(date_trunc('week', e.ts) AS DATE)) // 7) AS week_offset
        |        FROM events e JOIN first f ON f.user_id = e.user_id)
        |SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM act GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val first = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
      ev.join(first, "user_id")
        .select(col("user_id"),
          date_trunc("week", col("first_ts")).as("cohort_week"),
          (datediff(date_trunc("week", col("ts")), date_trunc("week", col("first_ts"))) / 7)
            .cast("long").as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_active"))
    },

    // ── Outlier detection: per-type 3σ rule via a broadcast stats join —
    // the per-group mean/stddev frame is group-cardinality-sized, so
    // the events scan streams past it without shuffling (the standard
    // two-pass z-score at scale). Counts only, so the float boundary
    // (|z| vs 3.0) is the checked semantics, not a float column. ──────
    Q(
      "events_outliers",
      """WITH stats AS (
        |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(CASE WHEN abs(e.value - s.mu) > 3 * s.sigma THEN 1 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN stats s ON s.event_type = e.event_type
        |GROUP BY e.event_type""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_pop("value").as("sigma"))
      ev.join(broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count(when(abs(col("value") - col("mu")) > lit(3) * col("sigma"), 1))
            .as("n_outliers"))
    },

    // ── Robust outliers: median/MAD instead of mean/σ — σ is dragged
    // by the very outliers it's meant to flag, MAD isn't (the standard
    // robust scale estimate). Two broadcast-stats passes (median, then
    // MAD around it), then the scan streams past both tiny frames; the
    // med/mad columns are part of the checked result, pinning that both
    // engines interpolate percentiles identically. ────────────────────
    Q(
      "events_outliers_robust",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m ON m.event_type = e.event_type
        |  GROUP BY e.event_type)
        |SELECT e.event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(CASE WHEN abs(e.value - m.med) > 3 * d.mad THEN 1 END) AS BIGINT) AS n_outliers,
        |       m.med AS med, d.mad AS mad
        |FROM events e
        |JOIN med m ON m.event_type = e.event_type
        |JOIN mad d ON d.event_type = e.event_type
        |GROUP BY e.event_type, m.med, d.mad""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
          count(lit(1)).as("n_events"),
          count(when(abs(col("value") - col("med")) > lit(3) * col("mad"), 1))
            .as("n_outliers"))
        .select(col("event_type"), col("n_events"), col("n_outliers"),
          col("med"), col("mad"))
    })

  /** DuckDB recomputation of the deterministic HLL (Hll.scala): the
    * SAME hex-nibble register math and the SAME estimator expression,
    * generated here so the two sides cannot drift structurally. */
  private[queries] lazy val hllOracleSql: String = {
    def hv(c: String) = s"(instr('0123456789abcdef', $c) - 1)"
    def d(k: Int) = s"d$k"
    def lz(e: String) =
      s"(CASE WHEN $e >= 8 THEN 0 WHEN $e >= 4 THEN 1 WHEN $e >= 2 THEN 2 " +
        s"WHEN $e = 1 THEN 3 ELSE 4 END)"
    val nibbles = (1 to 10)
      .map(k => s"${hv(s"substr(h, $k, 1)")} AS ${d(k)}").mkString(",\n    ")
    val rhoChain = (3 to 10)
      .map(k => s"WHEN ${d(k)} > 0 THEN ${4 * (k - 3) + 1} + ${lz(d(k))}")
      .mkString(" ")
    s"""WITH h AS (
       |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
       |nb AS (
       |  SELECT event_type,
       |    $nibbles
       |  FROM h),
       |rr AS (
       |  SELECT event_type, 16 * d1 + d2 AS bucket,
       |    CASE $rhoChain ELSE 33 END AS rho
       |  FROM nb),
       |regs AS (
       |  SELECT event_type, bucket, max(rho) AS r FROM rr GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type, sum(pow(2.0, -r)) AS s,
       |    256.0 - count(*) AS zeros
       |  FROM regs GROUP BY 1)
       |SELECT event_type,
       |  round(CASE WHEN 0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0 / (s + zeros)
       |                  <= 640.0 AND zeros > 0
       |             THEN 256.0 * ln(256.0 / zeros)
       |             ELSE 0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0 / (s + zeros)
       |        END, 4) AS est_distinct
       |FROM agg""".stripMargin
  }
}
