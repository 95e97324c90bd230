package graft.store

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension making the storage layer's EXTENSION VERBS
  * first-class `spark.sql(…)` statements — the Delta
  * `DeltaSqlParser` shape: `OPTIMIZE`, `VACUUM [DRY RUN]`,
  * `RESTORE`, `DESCRIBE DETAIL/HISTORY`, `CREATE TABLE … SHALLOW
  * CLONE …`, `ALTER TABLE … ADD/DROP CONSTRAINT` run through the
  * default session entry point, no [[GraftSql.execute]] call needed.
  *
  * Delegation discipline: the SESSION PARSER ALWAYS GETS FIRST TRY.
  * Only a statement Spark's own grammar REJECTS (`ParseException`) is
  * offered to the [[GraftSql]] router, and only when the router
  * statically recognizes it ([[GraftSql.routedSchema]]) does it become
  * a command — otherwise the ORIGINAL parse error surfaces untouched.
  * That ordering means this extension can never hijack a statement
  * Spark already executes (catalog DML, ALTER … RENAME COLUMN on
  * `graft.` identifiers, CTAS, …): it strictly ADDS the verbs the
  * grammar lacks. Parsing stays side-effect-free — the verb match
  * yields a [[GraftSqlCommand]] carrying the statement text and its
  * statically-known result schema; execution happens when the command
  * RUNS, like every other Spark command. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    describeFirst(sqlText).getOrElse {
      try delegate.parsePlan(sqlText)
      catch { case e: ParseException => routed(sqlText, e) }
    }

  // spark.sql(...) enters here (possibly-parameterized statements);
  // extension verbs carry no parameter markers, so the context is
  // consulted only on the delegate path
  override def parsePlanWithParameters(sqlText: String,
      context: ParameterContext): LogicalPlan =
    describeFirst(sqlText).getOrElse {
      try delegate.parsePlanWithParameters(sqlText, context)
      catch { case e: ParseException => routed(sqlText, e) }
    }

  // DESCRIBE HISTORY/DETAIL are the one exception to try-delegate-
  // first: Spark's grammar MIS-PARSES them (DESCRIBE <tbl> <col>)
  // instead of rejecting, so they would fail at analysis, never reach
  // the catch — see GraftSql.describeVerbSchema
  private def describeFirst(sqlText: String): Option[LogicalPlan] =
    GraftSql.describeVerbSchema(sqlText).map(GraftSqlCommand(sqlText, _))

  private def routed(sqlText: String, original: ParseException): LogicalPlan =
    GraftSql.routedSchema(sqlText) match {
      case Some(schema) => GraftSqlCommand(sqlText, schema)
      case None =>
        // EXPLAIN <extension verb>: also grammar-rejected (the inner
        // verb is unparseable), so unwrap the prefix and explain the
        // routed command without running it. FULL-statement match (the
        // regex pattern anchors both ends) — a typo'd statement merely
        // CONTAINING an explainable verb must keep its original error.
        sqlText match {
          case ExplainPrefix(mode, rest) =>
            GraftSql.routedSchema(rest).map { schema =>
              org.apache.spark.sql.execution.command.ExplainCommand(
                GraftSqlCommand(rest, schema),
                org.apache.spark.sql.execution.ExplainMode.fromString(
                  Option(mode).map(_.trim.toLowerCase).getOrElse("simple")))
            }.getOrElse(throw original)
          case _ => throw original
        }
    }

  private val ExplainPrefix =
    """(?is)\s*EXPLAIN\s+(EXTENDED|CODEGEN|COST|FORMATTED)?\s*(.+?)\s*""".r

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** One routed extension-verb statement as a standard Spark command:
  * `output` is the verb's statically-known schema (declared at parse
  * time — EXPLAIN shows it without executing anything), `run` hands
  * the original statement text to the [[GraftSql]] router, so the
  * SQL-string and spark.sql surfaces are one code path. */
case class GraftSqlCommand(sql: String, resultSchema: StructType)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(resultSchema)

  override def run(session: SparkSession): Seq[Row] =
    GraftSql.execute(session, sql).collect().toSeq

  override def simpleString(maxFields: Int): String =
    s"GraftSqlCommand ${sql.linesIterator.mkString(" ").take(80)}"
}
