package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Left-semi-join membership probe against a BROADCAST hash set:
  * `true` iff the child string is in the set.
  *
  * This is the scan-side form of `broadcast(set) LEFT SEMI JOIN` for
  * probes that happen INSIDE a value — e.g. per array element of a
  * split document, where a physical join operator would force an
  * explode + reassembly exchange carrying the text. The set ships via
  * an executor-lifetime `Broadcast` (once per executor, like a
  * BroadcastHashJoin's relation), NOT as a plan literal — a 100k-entry
  * hash set embedded in the plan re-serializes with every task and
  * bloats codegen; as a broadcast it is plan-invisible and O(1) per
  * probe either way.
  *
  * Null in → null out (three-valued logic, same as `IN`). */
case class BroadcastSetProbe(child: Expression, bc: Broadcast[JHashSet[String]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_broadcast_set_probe"

  override protected def nullSafeEval(v: Any): Any =
    bc.value.contains(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bcSet", bc, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ((java.util.HashSet<String>) $ref.value()).contains($v.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastSetProbe =
    copy(child = newChild)
}

object BroadcastSetProbe {

  /** Broadcast `values` on `spark` and return a Column-level probe:
    * `in(col)` ≡ "col IN broadcast set". */
  def broadcastSet(spark: org.apache.spark.sql.SparkSession,
      values: Iterable[String]): Broadcast[JHashSet[String]] = {
    val set = new JHashSet[String]()
    values.foreach(set.add)
    spark.sparkContext.broadcast(set)
  }

  def probe(child: Column, bc: Broadcast[JHashSet[String]]): Column =
    ColumnBridge.column(BroadcastSetProbe(ColumnBridge.expression(child), bc))
}
