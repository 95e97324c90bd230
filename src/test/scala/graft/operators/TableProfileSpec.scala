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
}
