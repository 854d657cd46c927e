package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * Spark 4 classic-mode equivalents of the pre-4.0 public
  * `new Column(expr)` / `col.expr`. Standard pattern for libraries
  * that ship custom Catalyst expressions (the expressions themselves
  * live in graft.functions).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
