package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingestion gate a corpus
  * pipeline runs before letting a drop into a curated table (the
  * published Delta Live Tables / Great Expectations concept): a rule
  * is a named boolean predicate; a row SATISFIES it only when the
  * predicate is true (NULL counts as a violation — an expectation you
  * cannot evaluate is not met).
  *
  * Two consumption shapes, both scan-friendly:
  *  - [[report]]: per-rule violation counts and rates in ONE
  *    aggregation job over one scan (the TableProfile pattern: the
  *    row-per-rule shape is a driver-side unpivot of a 1-row
  *    aggregate) — the monitoring/alerting surface.
  *  - [[validatedAppend]]: the enforcement surface over the logged
  *    layer — passing rows append to the table, violating rows append
  *    to a quarantine table WITH the names of the rules they broke
  *    (the PERMISSIVE-quarantine idea, applied to semantic rules
  *    instead of parse failures). Each side is one filter over the
  *    scan; nothing is persisted or collected, and both appends are
  *    atomic commits — a crash between them leaves the quarantine
  *    short, never the table wrong, and re-running the append is the
  *    caller's at-least-once retry (pair with appendOnce for
  *    exactly-once streaming ingestion).
  */
object Expectations {

  final case class Rule(name: String, predicate: Column) {
    require(name.nonEmpty && !name.exists(_.isWhitespace),
      s"rule names must be non-empty and whitespace-free: '$name'")
  }

  private def satisfied(r: Rule): Column = coalesce(r.predicate, lit(false))

  /** Names of the rules each row violates (empty array = clean row) —
    * scan-side, codegen-friendly (a when() per rule + array_compact;
    * no higher-order functions). */
  def violations(rules: Seq[Rule]): Column =
    array_compact(array(rules.map(r =>
      when(!satisfied(r), lit(r.name)).otherwise(lit(null))): _*))

  /** Per-rule violation accounting: (rule, n_rows, n_violations,
    * violation_rate), one aggregation job over one scan. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(!satisfied(r), 1L).otherwise(0L)).as(s"r$i")
    }
    val stacked = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', r$i" }.mkString(", ")
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .selectExpr("n_rows",
        s"stack(${rules.size}, $stacked) AS (rule, n_violations)")
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations").cast("double") / col("n_rows"))
          .as("violation_rate"))
  }

  /** Gate an append on the rules: clean rows commit to `tablePath`,
    * violating rows commit to `quarantinePath` with a `violated`
    * column naming the rules they broke. Returns the table version
    * won (None when every row was quarantined). */
  def validatedAppend(df: DataFrame, rules: Seq[Rule], tablePath: String,
      quarantinePath: String,
      publisher: AtomicPublisher = RenameOrLinkPublisher): Option[Long] = {
    require(rules.nonEmpty, "no rules")
    val tagged = df.withColumn("violated", violations(rules))
    val bad = tagged.filter(size(col("violated")) > 0)
    // quarantine FIRST: a crash between the two commits then leaves a
    // conservatively over-full quarantine, never an unvalidated table
    if (!bad.isEmpty) { CommitLog.append(bad, quarantinePath, publisher); () }
    val good = tagged.filter(size(col("violated")) === 0).drop("violated")
    if (good.isEmpty) None
    else Some(CommitLog.append(good, tablePath, publisher))
  }
}
