package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 routes the public [[Column]] API through ColumnNode and
  * keeps the Expression⇄Column converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils). This shim lives in
  * the sql package purely to re-export them for graft.expr — the one
  * place the engine hands a raw Catalyst Expression (Cuid) to the
  * DataFrame API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
