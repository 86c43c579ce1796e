package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two `array<long>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * interpreted (no whole-stage codegen), which makes them the bottleneck of
  * the ANN/near-dup queries — one lambda invocation per element per row.
  * This native expression emits a tight primitive loop instead, keeping the
  * similarity scan inside codegen. Null if either side is null; arrays are
  * truncated to the shorter length (quantized embeddings are fixed-width,
  * so this never triggers in practice).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct = copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def apply(a: Column, b: Column): Column =
    Shims.column(ArrayDotProduct(Shims.expression(a), Shims.expression(b)))
}
