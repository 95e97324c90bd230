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

  /** The diagnostic that DECIDES whether a key needs the treatment
    * above: the k hottest keys with their row counts, corpus share,
    * and skew-vs-uniform ratio (n·n_keys/total — 1.0 means the key
    * holds exactly a uniform share; a shuffle on this key runs at the
    * speed of the hottest ratio). Run it on a join/groupBy key BEFORE
    * picking salting factors or AQE thresholds — at 100 TB the report
    * costs one scalar-key aggregation; discovering the skew from a
    * straggling stage costs the stage.
    *
    * Plan shape: counts aggregate map-side to one (key, n) exchange;
    * the 2-value totals row broadcasts back; the cut is TakeOrdered
    * (n DESC, key — deterministic under ties), never a global sort. */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    // materialized once: the counts subtree (full scan + key exchange)
    // feeds BOTH the totals aggregate and the report projection —
    // without this the table scans twice. Eager localCheckpoint, not
    // persist, so the (key-cardinality-sized) blocks are
    // ContextCleaner-collected with the result frame (the
    // semanticDedup pattern).
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(true)
    val totals = counts.agg(sum("n_rows").as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n_rows"),
        round(col("n_rows") * lit(100.0) / col("total"), 4).as("share_pct"),
        round(col("n_rows") * col("n_keys") / col("total").cast("double"), 4)
          .as("skew_vs_uniform"))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(k)
  }
}
