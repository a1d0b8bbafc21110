package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction for expressions that
  * cannot be registered as SQL functions because they carry runtime
  * handles (e.g. [[graft.functions.BloomMightContain]] wraps a
  * `Broadcast[BloomFilter]` — there is no SQL literal for a broadcast).
  * Everything registrable stays on the `GraftExtensions` + `expr(...)`
  * route; this is only for handle-carrying expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
