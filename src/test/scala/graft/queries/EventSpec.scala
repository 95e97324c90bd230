package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The gaps-and-islands sessionization (oracle-checkable) must agree
  * with Spark's built-in session_window() (the idiomatic form, not
  * expressible in portable SQL): same session count and same total
  * event count per user. */
class EventSpec extends SparkSpec {

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
}

private object SparkEntryHelpers {
  def run(name: String, spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)
}
