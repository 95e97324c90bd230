package graft.store

import graft.sources.GraftLogBatch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule upgrading a [[GraftCatalog]] READ to the native v1
  * relation — the Delta `DeltaAnalysis` pattern: the catalog resolves
  * `graft.t` to a DSv2 relation (so every SQL entry point works with
  * no graft-specific syntax), and this rule swaps the resolved leaf
  * for [[GraftLogBatch.relation]]'s plan — log-stats file pruning
  * (`GraftLogFileIndex`), Spark's vectorized parquet scan, whole-stage
  * codegen, and snapshot-sized `sizeInBytes` for broadcast planning —
  * so a catalog SELECT costs exactly what a `format("graftlog")` read
  * costs, with zero row-conversion seam. Sessions without the rule
  * still read correctly through the `V1Scan` fallback.
  *
  * The swap keeps the V2 relation's OUTPUT ATTRIBUTES (same exprIds),
  * so references already resolved against the leaf stay bound.
  * Relations that are the TARGET of a write or row-level command are
  * left as V2 nodes — the write/delete paths consume the Table object
  * itself; only read positions convert. Registered via
  * [[graft.functions.GraftExtensions]] (`spark.sql.extensions`). */
final case class GraftV2ReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // write/row-level targets keep their V2 relation (identity-keyed:
    // the same node instance appears in the command's table slot)
    val keep = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(p: LogicalPlan): Unit =
      p.collect { case r: DataSourceV2Relation => r }.foreach(keep.add(_))
    plan.foreach {
      case w: V2WriteCommand => mark(w.table)
      // pre-resolution INSERT shape: if rule ordering ever runs this
      // rule before ResolveInsertInto rewrites the statement into a
      // V2WriteCommand, converting its target would reroute the INSERT
      // to the v1 write path and bypass the commit log — mark it too
      case i: InsertIntoStatement => mark(i.table)
      case d: DeleteFromTable => mark(d.table)
      case u: UpdateTable => mark(u.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r @ DataSourceV2Relation(t: GraftTable, _, _, _, _, _)
          if !keep.contains(r) =>
        val params = Map("path" -> t.path) ++
          (if (t.asOf == Long.MaxValue) Map.empty
           else Map("versionAsOf" -> t.asOf.toString))
        val rel = GraftLogBatch.relation(spark, params, Some(t.schema))
        // carry the v1 catalog descriptor: Catalog.refreshTable (run
        // by streaming writes into the table, among others) walks
        // cached plans and dereferences LogicalRelation.catalogTable
        LogicalRelation(rel,
          r.output.map(_.asInstanceOf[AttributeReference]),
          Some(t.v1Table), isStreaming = false, None)
    }
  }
}
