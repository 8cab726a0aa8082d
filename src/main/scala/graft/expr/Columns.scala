package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between raw Catalyst [[Expression]]s and the public
  * [[Column]] API (Spark 4 routes Column through ColumnNode; the
  * classic-session helper converts both ways).
  */
object Columns {
  def of(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  def expr(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
}
