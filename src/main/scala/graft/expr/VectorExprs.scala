package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is semantically identical but materializes the zipped array and
  * evaluates two lambdas per element; on the all-pairs similarity
  * queries that's the entire runtime (sim_neardup: ~21 s of a ~58 s
  * sf0.1 bench). This expression is a tight fused loop inside
  * whole-stage codegen — the (b)-tier custom-Expression path the
  * build contract prescribes when built-ins can't hit the perf bar.
  *
  * Summation is in array order, exactly like the HOF chain, so every
  * DuckDB-oracle comparison is unchanged.
  *
  * Null handling: null input array → null result; MISMATCHED lengths →
  * null (the HOF chain null-pads the shorter side, nullifying the
  * aggregate — a silent partial dot over min(length) would pollute
  * top-k results undetectably if mixed-dimension embeddings ever land
  * in one table); null *elements* are treated as 0 (embeddings never
  * carry null elements; documented contract).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two ARRAY<DOUBLE>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** `dot(a, b)` over ARRAY<DOUBLE> columns, whole-stage-codegen'd. */
  def dotProduct(a: Column, b: Column): Column =
    Columns.of(DotProduct(Columns.expr(a), Columns.expr(b)))
}
