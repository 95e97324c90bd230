package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile statistics are exact on a controlled frame") {
    val df = Seq(
      (1L, Some("a"), "xx"),
      (2L, Some("b"), "yyyy"),
      (3L, None, "zz"),
      (4L, Some("b"), "zz")
    ).toDF("id", "cat", "s")
    val p = TableProfile.profileColumns(df, Seq("id", "cat", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "cat", "s"))
    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    val cat = p("cat")
    assert(cat.getLong(2) == 1, "one null in cat")
    assert(cat.getLong(3) == 2, "distinct ignores nulls")
    assert(cat.getString(4) == "a" && cat.getString(5) == "b")
    assert(math.abs(cat.getDouble(6) - 1.0) < 1e-9, "avg_len over non-null values")
    val s = p("s")
    assert(s.getLong(3) == 3 && math.abs(s.getDouble(6) - 2.5) < 1e-9)
  }

  test("one scan: the whole profile is a single aggregation over the input") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("m", col("id") % 10)
    val plan = TableProfile.profileColumns(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    // exactly one range scan feeds the profile — per-column passes
    // would show one scan per profiled column
    assert("Range \\(0, 1000".r.findAllIn(plan).size == 1,
      s"profile scanned the input more than once:\n$plan")
  }

  test("approx distincts: Expand disappears from the plan, estimates stay close") {
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("m", col("id") % 100)
    val exact = TableProfile.profileColumns(df, Seq("id", "m"))
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-column distincts are expected to ride Expand")
    val approx = TableProfile.profileColumns(df, Seq("id", "m"), exactDistincts = false)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx profile still pays the Expand:\n$plan")
    // same single-scan contract as the exact path
    assert("Range \\(0, 5000".r.findAllIn(plan).size == 1,
      s"approx profile scanned the input more than once:\n$plan")
    val est = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL++ default rsd is 5%; bound at 3x that (estimates are
    // deterministic for a fixed input, this guards regressions)
    assert(math.abs(est("id") - 5000.0) / 5000.0 < 0.15, s"id est ${est("id")}")
    assert(math.abs(est("m") - 100.0) / 100.0 < 0.15, s"m est ${est("m")}")
    // the non-distinct statistics are UNCHANGED by the swap
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    Seq("id", "m").foreach { c =>
      assert(e(c).getLong(1) == a(c).getLong(1) && e(c).getLong(2) == a(c).getLong(2)
        && e(c).getString(4) == a(c).getString(4) && e(c).getString(5) == a(c).getString(5))
    }
  }
}
