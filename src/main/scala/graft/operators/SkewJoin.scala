package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7 / builder brief:
  * "salting for skew").
  *
  * When one join key holds a large fraction of the left side, the
  * shuffle hash-partitions that key into ONE task and the stage runs at
  * the speed of its hottest key. AQE's skew-join split handles sort-
  * merge cases adaptively; this operator is the explicit form for when
  * the planner can't (e.g. the skew is known and extreme, or the join
  * feeds a stage AQE can't re-plan).
  *
  *  - left rows get a deterministic salt in [0, factor): pmod over a
  *    stable hash of the whole row — deterministic under retry, no
  *    rand() (a retried task re-salting differently would corrupt an
  *    at-least-once sink);
  *  - right rows are replicated `factor` times (explode of a literal
  *    range) — right side must be the smaller/broadcastable one;
  *  - the join key becomes (key, salt), splitting each hot key into
  *    `factor` independent partitions.
  *
  * Result set is row-for-row identical to the unsalted join
  * (SkewJoinSpec asserts equality).
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor >= 1)
    val leftSalted = left.withColumn("__salt",
      pmod(hash(struct(left.columns.map(col): _*)), lit(factor)))
    val rightSalted = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    leftSalted.join(rightSalted, Seq(key, "__salt")).drop("__salt")
  }
}
