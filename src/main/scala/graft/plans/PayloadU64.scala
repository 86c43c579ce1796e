package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Zero-padded 8-byte payload → u64 (as Long bits), little- or big-endian.
  *
  * The shared-view decode assembles each payload into two u64s ONCE per
  * frame and lets every signal extract with constant shift/mask — per-signal
  * byte loops ([[CanSignalExtract]]) repeat the assembly N times, and the
  * built-in `conv(rpad(hex(data)))` materializes two strings per frame.
  * This expression is the no-allocation assembly for the shared views.
  */
case class PayloadU64(child: Expression, littleEndian: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = math.min(8, b.length)
    var u = 0L
    var i = 0
    if (littleEndian) while (i < n) { u |= (b(i) & 0xFFL) << (8 * i); i += 1 }
    else while (i < n) { u |= (b(i) & 0xFFL) << (8 * (7 - i)); i += 1 }
    u
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val u = ctx.freshName("u")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sh = if (littleEndian) s"(8 * $i)" else s"(8 * (7 - $i))"
      s"""
         |long $u = 0L;
         |int $n = java.lang.Math.min(8, $b.length);
         |for (int $i = 0; $i < $n; $i++) { $u |= (($b[$i]) & 0xFFL) << $sh; }
         |${ev.value} = $u;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PayloadU64 =
    copy(child = newChild)
}

object PayloadU64 {
  def apply(data: Column, littleEndian: Boolean): Column =
    Shims.column(PayloadU64(Shims.expression(data), littleEndian))
}
