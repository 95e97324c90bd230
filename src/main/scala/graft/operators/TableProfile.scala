package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level table profiling — the data-QA pass a pipeline runs on
  * every new corpus drop before trusting it (null rates, cardinality,
  * value ranges, width): one row per profiled column with
  * (n_rows, n_nulls, n_distinct, min_value, max_value, avg_len).
  *
  * Scale shape: ONE aggregation job for the whole profile. All
  * per-column statistics are expressions of a single `agg(...)` — one
  * scan, partial+final combine, a 1-row result — and the row-per-column
  * shape is a driver-side unpivot (`stack`) of that 1-row frame:
  * cols-sized, never data-sized. The exact multi-column distinct
  * counts ride Spark's Expand machinery (the standard grouping-sets
  * plan: the shuffle carries one scalar per profiled column per row —
  * the cost floor any exact answer pays). `exactDistincts = false` is
  * the 100 TB switch: `approx_count_distinct` (Spark's HLL++ sketch,
  * ~2% default error) is an ordinary partial-merge aggregate like the
  * others, so the Expand disappears and the whole profile is one
  * sketch-sized combine per column — profile cost stops scaling with
  * per-column cardinality entirely.
  *
  * min/max are computed on the NATIVE type (so numeric columns order
  * numerically) and cast to string afterwards for the uniform row
  * shape; avg_len is the mean decimal-/string-rendered width —
  * for text columns, the mean document length.
  */
object TableProfile {

  def profileColumns(df: DataFrame, cols: Seq[String],
      exactDistincts: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    // index-keyed aliases: stack()'s expr string must not have to
    // re-quote arbitrary source column names
    val distinctOf: Column => Column =
      if (exactDistincts) countDistinct(_) else approx_count_distinct(_)
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"c${i}_nonnull"),
        distinctOf(col(c)).as(s"c${i}_distinct"),
        min(col(c)).cast("string").as(s"c${i}_min"),
        max(col(c)).cast("string").as(s"c${i}_max"),
        avg(length(col(c).cast("string"))).as(s"c${i}_avglen"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', c${i}_nonnull, c${i}_distinct, c${i}_min, c${i}_max, c${i}_avglen"
    }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $stacked) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value, avg_len)")
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"),
        col("avg_len"))
  }
}
