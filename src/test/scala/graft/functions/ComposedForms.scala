package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The composed-builtin reference forms the native kernels are pinned
  * against — ONE copy, shared by the example-based and property-based
  * suites so both always test the same executable spec. */
object ComposedForms {

  /** Reference form of TokenMemberCounts:
    * [n_tokens, size(filter(tokens, contains(set_i)))...]. */
  def tokenHits(text: Column, lists: Seq[Seq[String]]): Column = {
    val toks = split(text, " ", -1)
    array((size(toks).cast("long") +: lists.map(l =>
      size(filter(toks, t => array_contains(typedlit(l), t))).cast("long"))): _*)
  }
}
