package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row
  * with `right.ts <= left.ts` on the same key (the canonical
  * time-series enrichment operator; named in the builder brief as a
  * composition target).
  *
  * Spark has no native as-of join, and the naive formulation (equi-key
  * + range predicate + row_number) degenerates into a per-key
  * min-of-filtered-join that materializes every (left, candidate-right)
  * pair before pruning. This implementation is the scale-correct
  * union-window form:
  *
  *   1. tag left rows side=1, right rows side=0;
  *   2. union by (key, ts, side) with each side's payload in a struct;
  *   3. one window per key ordered by (ts, side):
  *      `last(right_payload, ignoreNulls)` carries the latest right
  *      payload forward onto each left row — right-before-left at equal
  *      ts makes the join inclusive (>= semantics, matching DuckDB's
  *      ASOF JOIN, which oracles the query);
  *   4. keep side=1 rows and flatten.
  *
  * Cost: ONE shuffle on the key (the window), state = one payload
  * struct per row — no pair materialization, no driver involvement.
  * Skewed keys behave like any window (sort within key); for a
  * pathological single key, pre-bucket by time range first.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (must not collide with
    *                     left column names — pre-rename on the right) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    // __r as the final sort key: multiple right rows sharing (key, ts)
    // would otherwise be ordered arbitrarily and last() would pick
    // nondeterministically; payload-struct order makes the winner stable
    // (the max payload at equal ts).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
