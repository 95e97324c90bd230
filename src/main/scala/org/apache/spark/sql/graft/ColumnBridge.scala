package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters
  * (`classic.ExpressionUtils`, Spark 4's replacement for the removed
  * `new Column(expr)`). Needed for expressions that carry a RUNTIME
  * handle — e.g. a `Broadcast` hash set — which cannot ride the
  * registered-function path (function builders only see literal
  * argument expressions). Kept to the two converters; everything else
  * stays on the public DSL. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
