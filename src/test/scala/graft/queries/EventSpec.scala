package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The gaps-and-islands sessionization (oracle-checkable) must agree
  * with Spark's built-in session_window() (the idiomatic form, not
  * expressible in portable SQL): same session count and same total
  * event count per user. */
class EventSpec extends SparkSpec {
  import spark.implicits._

  test("session_window ≡ gaps-and-islands sessionization (30 min gap)") {
    val dir = sf("sf0.001")
    val islands = SparkEntryHelpers.run("events_sessionize", spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
    val builtin = Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("cnt").as("n_events"))
    assert(islands.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(islands).count() == 0)
  }

  test("percentile_approx honors its RANK-error contract per group") {
    val dir = sf("sf0.001")
    val approx = SparkEntryHelpers.run("events_percentiles_approx", spark, dir).collect()
    assert(approx.nonEmpty)
    val byType = Tables.load(spark, dir, "events")
      .select("event_type", "value").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // the sketch's guarantee is on the returned element's RANK, not its
    // value (a sparse tail can make nearby ranks far apart in value):
    // accuracy=1000 ⇒ relative rank error ≤ 1/1000, plus one element of
    // slack for the exact query's interpolation
    approx.foreach { r =>
      val vals = byType(r.getString(0))
      val n = vals.length.toDouble
      val tol = 1.0 / 1000 + 2.0 / n
      for ((c, p) <- Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))) {
        val av = r.getAs[Double](c)
        val atMost = vals.count(_ <= av) / n  // rank ceiling of av
        val below = vals.count(_ < av) / n    // rank floor of av
        assert(atMost >= p - tol && below <= p + tol,
          s"${r.getString(0)} $c=$av sits at rank [$below, $atMost], " +
            s"outside $p ± $tol (n=${vals.length})")
      }
    }
  }

  test("approx_count_distinct within its rsd bound of the exact count (D4 scale path)") {
    val dir = sf("sf0.001")
    val approx = SparkEntryHelpers.run("events_approx_distinct", spark, dir)
      .select("event_type", "approx_users")
    val exact = Tables.load(spark, dir, "events").groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type").collect()
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) / e < 0.1, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }
  test("deterministic HLL: accurate, and registers merge by max losslessly") {
    import graft.operators.Hll
    val dir = sf("sf0.001")
    val ev = Tables.load(spark, dir, "events")
    // accuracy: standard error for m=256 is ~1.04/√256 = 6.5%; allow 3σ
    val est = Hll.approxDistinct(ev, Seq("event_type"), col("user_id"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
    est.join(exact, "event_type").collect().foreach { r =>
      val a = r.getAs[Double]("est_distinct")
      val e = r.getAs[Long]("e").toDouble
      assert(math.abs(a - e) / e < 0.2, s"${r.getString(0)}: HLL $a vs exact $e")
    }
    // mergeability: registers from two disjoint halves, max-merged,
    // give the EXACT same estimate as one pass over everything — the
    // property that lets the sketch combine across partitions/days
    val whole = Hll.approxDistinct(ev, Seq("event_type"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val h1 = Hll.registers(ev.filter(col("event_id") % 2 === 0),
      Seq("event_type"), col("user_id"))
    val h2 = Hll.registers(ev.filter(col("event_id") % 2 =!= 0),
      Seq("event_type"), col("user_id"))
    val merged = h1.unionAll(h2)
      .groupBy("event_type", "bucket").agg(max(col("r")).as("r"))
    val fromMerged = Hll.estimate(merged, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fromMerged == whole,
      s"merged registers diverged: $fromMerged vs $whole")
  }
  test("HLL small-m bias constants match the published table (b=4 is not the closed form)") {
    import graft.operators.Hll
    // Flajolet et al. 2007: alpha_16 = 0.673; the 0.7213/(1+1.079/m)
    // closed form applies only from m = 128 up
    assert(Hll.alphaOf(16) == 0.673 && Hll.alphaOf(32) == 0.697 &&
      Hll.alphaOf(64) == 0.709)
    assert(Hll.alphaOf(256) == 0.7213 / (1.0 + 1.079 / 256.0))
    // b=4 end-to-end: m=16 → rsd ~26%; the deterministic md5 registers
    // make this a fixed number, bounded loosely here
    val ev = Tables.load(spark, sf("sf0.001"), "events")
    val est4 = Hll.approxDistinct(ev, Seq("event_type"), col("user_id"), b = 4)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
    est4.join(exact, "event_type").collect().foreach { r =>
      val a = r.getAs[Double]("est_distinct")
      val e = r.getAs[Long]("e").toDouble
      assert(math.abs(a - e) / e < 0.8, s"${r.getString(0)}: b=4 HLL $a vs exact $e")
    }
  }
}

private object SparkEntryHelpers {
  def run(name: String, spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)
}
