package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics the oracle query exercises only in aggregate:
  * inclusivity at equal timestamps, null on no-prior-match, latest-wins
  * among multiple candidates, and plan shape (no join node at all —
  * one window over the union). */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"),
    (2L, 10L, "m10")).toDF("k", "ts", "lv")
  private val right = Seq(
    (1L, 10L, "r10"), (1L, 15L, "r15"),
    (3L, 1L, "rx")).toDF("k", "rts", "rv")

  private lazy val joined = AsOfJoin.asOf(left, right,
    keys = Seq("k"), leftTs = "ts", rightTs = "rts",
    rightPayload = Seq("rts", "rv"))
    .select("k", "ts", "lv", "rts", "rv")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4))).toSet

  test("equal ts matches (inclusive >=); latest prior wins; no prior → null") {
    assert(joined == Set(
      (1L, 10L, "l10", 10L, "r10"),  // equal ts: inclusive
      (1L, 20L, "l20", 15L, "r15"),  // latest of {10, 15}
      (1L, 5L, "l5", -1L, null),     // no right row at or before 5
      (2L, 10L, "m10", -1L, null)))  // key with no right rows at all
  }

  test("plans as one window over a union — no join operator") {
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in as-of plan:\n$plan")
    assert(plan.contains("Window"), "expected window operator")
  }
}
