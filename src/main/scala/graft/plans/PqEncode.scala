package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encode as ONE native expression: for each of `m`
  * subspaces pick `argmin_c ‖v_s − C_sc‖²` over `kCent` centroids (ranked
  * by the integer key `‖C_sc‖² − 2·⟨v_s, C_sc⟩`, ties to the lowest
  * code), returning the `array<int>` of codes.
  *
  * The expression-tree formulations measured hundreds of µs/row on the
  * bench board: a struct `array_min` form pays 16 `slice` copies + a
  * 16-struct allocation ranked by interpreted row ordering per subspace
  * per row, and a `least(d·k+c, …)` form inflates to 128 nested
  * [[ArrayDotProduct]] nodes whose generated projection falls out of
  * codegen at this size. One opaque expression with the codebook as a
  * reference object keeps the whole encode a three-deep primitive loop
  * (~m·kCent·sub multiplies, zero allocation) in BOTH the codegen and
  * interpreted paths.
  *
  * `cb(s)(c)` is the quantized centroid subvector (length `sub`); `cc2`
  * its squared norm. Input vectors must have at least `m·sub` elements
  * (the callers quantize fixed-width embeddings).
  */
case class PqEncode(child: Expression, cb: Array[Array[Array[Long]]],
    cc2: Array[Array[Long]]) extends UnaryExpression {

  private val m = cb.length
  private val kCent = cb.headOption.map(_.length).getOrElse(0)
  private val sub = cb.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // loud, not garbage: UnsafeArrayData.getLong does NOT bounds-check,
    // so a ragged vector would silently encode nonsense
    if (v.numElements() < m * sub)
      throw new IllegalArgumentException(
        s"PqEncode: vector has ${v.numElements()} elements, needs ${m * sub}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestKey = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < kCent) {
        var dot = 0L
        val cent = cb(s)(c)
        var j = 0
        while (j < sub) { dot += v.getLong(s * sub + j) * cent(j); j += 1 }
        val key = cc2(s)(c) - 2 * dot
        if (key < bestKey) { bestKey = key; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // flattened codebook: centroid (s, c) at cbRef[s*kCent + c]
    val flat: Array[Array[Long]] =
      Array.tabulate(m * kCent)(i => cb(i / kCent)(i % kCent))
    val cc2Flat: Array[Long] =
      Array.tabulate(m * kCent)(i => cc2(i / kCent)(i % kCent))
    val cbRef = ctx.addReferenceObj("pqCb", flat, "long[][]")
    val cc2Ref = ctx.addReferenceObj("pqCc2", cc2Flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val key = ctx.freshName("key")
      val bestKey = ctx.freshName("bestKey")
      val bestC = ctx.freshName("bestC")
      val cent = ctx.freshName("cent")
      s"""
         |if ($v.numElements() < ${m * sub}) {
         |  throw new IllegalArgumentException(
         |    "PqEncode: vector has " + $v.numElements() +
         |    " elements, needs ${m * sub}");
         |}
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  long $bestKey = Long.MAX_VALUE;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $kCent; $c++) {
         |    long[] $cent = $cbRef[$s * $kCent + $c];
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      $dot += $v.getLong($s * $sub + $j) * $cent[$j];
         |    }
         |    long $key = $cc2Ref[$s * $kCent + $c] - 2L * $dot;
         |    if ($key < $bestKey) { $bestKey = $key; $bestC = $c; }
         |  }
         |  $out[$s] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(qv: Column, cb: Array[Array[Array[Long]]],
      cc2: Array[Array[Long]]): Column =
    Shims.column(PqEncode(Shims.expression(qv), cb, cc2))
}
