package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Exact integer dot product of two integral array columns (`array<long>`
  * and, since the int8-quantized ANN layout, any mix of
  * `array<tinyint|smallint|int|bigint>` — the compressed-code scan reads
  * one byte per dimension and must not pay a per-element cast back to
  * long).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * interpreted (no whole-stage codegen), which makes them the bottleneck of
  * the ANN/near-dup queries — one lambda invocation per element per row.
  * This native expression emits a tight primitive loop instead, keeping the
  * similarity scan inside codegen. Null if either side is null; arrays are
  * truncated to the shorter length (quantized embeddings are fixed-width,
  * so this never triggers in practice). The accumulator is always long.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(dt: DataType, arr: ArrayData, i: Int): Long = dt match {
    case ByteType => arr.getByte(i).toLong
    case ShortType => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case _ => arr.getLong(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += get(lt, x, i) * get(rt, y, i); i += 1 }
    acc
  }

  private def accessor(dt: DataType, arr: String, i: String): String = dt match {
    case ByteType => s"(long) $arr.getByte($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case _ => s"$arr.getLong($i)"
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
         |  $acc += ${accessor(elemType(left), a, i)} * ${accessor(elemType(right), b, i)};
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
