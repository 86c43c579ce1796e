package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Raw CAN signal extraction straight from the payload bytes — the custom
  * Expression SURVEY §2.2 P3 names as the codegen-native alternative to the
  * composed built-ins (`shiftrightunsigned`/`&` over a `conv(hex(...))`
  * u64). The built-in path materializes two hex strings per frame; this
  * emits a tight byte loop + constant shift/mask per signal (start/len/
  * endianness are plan-time constants, so the generated code is literal
  * arithmetic). Both paths are differentially tested against an independent
  * bit-by-bit reference.
  *
  * Semantics (zero-padded 8-byte payload, DBC numbering):
  *   - Intel (`@1`): little-endian u64, `(u >>> startBit) & mask`;
  *   - Motorola (`@0`): big-endian u64, MSB at sawtooth position
  *     `(s/8)*8 + 7 - s%8`, field read MSB-first;
  *   - signed: two's-complement sign extension of the low `bitLen` bits.
  */
case class CanSignalExtract(child: Expression, startBit: Int, bitLen: Int,
    littleEndian: Boolean, signed: Boolean) extends UnaryExpression {

  require(bitLen >= 1 && bitLen <= 64, s"bitLen $bitLen out of [1,64]")
  override def dataType: DataType = LongType

  private val msbPos = (startBit / 8) * 8 + (7 - startBit % 8)
  private val beShift = 64 - msbPos - bitLen
  require(littleEndian || beShift >= 0, s"motorola field exceeds payload")
  // the Intel twin of the motorola check above: without it an overlong
  // field silently reads zeros into its high bits (mask past bit 63)
  // instead of failing like the big-endian side does
  require(!littleEndian || startBit + bitLen <= 64,
    s"intel field [$startBit, ${startBit + bitLen}) exceeds the 64-bit payload")
  private val mask = if (bitLen >= 64) -1L else (1L << bitLen) - 1L
  private val signShift = 64 - bitLen

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var u = 0L
    val n = math.min(8, b.length)
    var i = 0
    if (littleEndian) {
      while (i < n) { u |= (b(i) & 0xFFL) << (8 * i); i += 1 }
      val raw = (u >>> startBit) & mask
      if (signed && bitLen < 64) (raw << signShift) >> signShift else raw
    } else {
      while (i < n) { u |= (b(i) & 0xFFL) << (8 * (7 - i)); i += 1 }
      val raw = (u >>> beShift) & mask
      if (signed && bitLen < 64) (raw << signShift) >> signShift else raw
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val u = ctx.freshName("u")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val raw = ctx.freshName("raw")
      val assemble =
        if (littleEndian) s"$u |= (($b[$i]) & 0xFFL) << (8 * $i);"
        else s"$u |= (($b[$i]) & 0xFFL) << (8 * (7 - $i));"
      val shift = if (littleEndian) startBit else beShift
      val signExt =
        if (signed && bitLen < 64) s"$raw = ($raw << $signShift) >> $signShift;" else ""
      s"""
         |long $u = 0L;
         |int $n = java.lang.Math.min(8, $b.length);
         |for (int $i = 0; $i < $n; $i++) { $assemble }
         |long $raw = ($u >>> $shift) & ${mask}L;
         |$signExt
         |${ev.value} = $raw;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CanSignalExtract =
    copy(child = newChild)
}

object CanSignalExtract {
  def apply(data: Column, startBit: Int, bitLen: Int,
      littleEndian: Boolean, signed: Boolean): Column =
    Shims.column(CanSignalExtract(Shims.expression(data), startBit, bitLen,
      littleEndian, signed))
}
