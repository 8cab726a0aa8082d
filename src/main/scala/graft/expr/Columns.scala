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

  /** Oracle-bit-stable rounding of a QUOTIENT: floor(x·10^d + 0.5)/10^d
    * in plain double ops, mirrored VERBATIM in the DuckDB oracle SQL so
    * both engines run the same IEEE instructions. Engine-native round()
    * diverges when the true value lies within 1 ulp of a decimal
    * half-boundary: Spark rounds the exact binary value via BigDecimal
    * HALF_UP while DuckDB multiplies by 10^d first (observed at sf0.1:
    * 1334.37/24 → 55.5987 vs 55.5988). Use for any oracle-facing round
    * of a division whose operands are bit-identical across engines;
    * round(sum, k) stays native — its divergence class is summation
    * order, which no rounding formula fixes. */
  def roundQ(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    org.apache.spark.sql.functions.floor(c * p + 0.5) / p
  }
}
