package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, ConditionalExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.DataType

/** Forces `body`'s generated code into its own private method of the
  * generated class instead of inlining it at the call site.
  *
  * Why this exists: whole-stage codegen inlines every projected expression
  * tree into one `doConsume` method. A DBC-wide decode projects one
  * expression tree per signal, so at fleet width (hundreds of signals —
  * the reference's own `fs.dbc` workflow) that method blows past HotSpot's
  * 8000-bytecode JIT ceiling around ~40 signals and past Janino's hard
  * 64 KB method limit around ~500 — Spark cannot split a projection inside
  * whole-stage codegen because the inputs live in `doConsume` locals.
  * Wrapping each signal's tree in `Outline` gives every signal its own
  * small, JIT-compilable method and leaves only one call site per signal
  * in `doConsume`, so the decode stays a single whole-stage-codegen span at
  * any realistic network width (measured: 129-col decode of 100k frames
  * 2.39 s interpreted → sub-second outlined; 513-col fails to compile at
  * all without this).
  *
  * `body` must reference its inputs positionally as `BoundReference(i)`
  * into `inputs` — the semantics are exactly `body` evaluated over the row
  * `[inputs(0), ..., inputs(n-1)]`, so any Catalyst tree (with its exact
  * ANSI cast/overflow behavior) can be outlined without re-expressing its
  * semantics by hand. The interpreted path materializes that row per call
  * and is only used when codegen is disabled or has fallen back.
  *
  * Implements [[ConditionalExpression]] with `alwaysEvaluatedInputs =
  * inputs` and no branch groups: subexpression elimination (both the
  * interpreted `SubExprEvaluationRuntime` and whole-stage codegen's CSE)
  * walks projection lists for common subtrees and would otherwise hoist
  * pieces of `body` — whose `BoundReference`s index OUR synthetic row, not
  * the projection input — to evaluate against the outer row (observed:
  * `CASE WHEN input[0]=...` shared by two signals of one message hoisted
  * onto the frame row, reading `ts_ms` as the can_id). The conditional
  * contract restricts CSE to `inputs`, which genuinely are outer-row
  * expressions.
  */
case class Outline(inputs: Seq[Expression], body: Expression)
    extends Expression with ConditionalExpression {

  override def alwaysEvaluatedInputs: Seq[Expression] = inputs
  override def withNewAlwaysEvaluatedInputs(newInputs: Seq[Expression]): Outline =
    copy(inputs = newInputs)
  override def branchGroups: Seq[Seq[Expression]] = Nil

  override def children: Seq[Expression] = inputs :+ body
  override def dataType: DataType = body.dataType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = children.forall(_.deterministic)

  override def eval(input: InternalRow): Any =
    body.eval(InternalRow.fromSeq(inputs.map(_.eval(input))))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val inputCodes = inputs.map(_.genCode(ctx))
    // Parameters of the outlined method, presented to body's codegen as the
    // "current vars" so BoundReference(i) resolves to parameter i.
    val params = inputs.zipWithIndex.map { case (in, i) =>
      (ctx.freshName(s"oIn$i"), ctx.freshName(s"oIn${i}Null"),
        CodeGenerator.javaType(in.dataType), in.dataType)
    }
    val paramVars = params.map { case (v, n, _, dt) =>
      ExprCode(JavaCode.isNullVariable(n), JavaCode.variable(v, dt))
    }
    val oldVars = ctx.currentVars
    val oldRow = ctx.INPUT_ROW
    val bodyCode =
      try {
        ctx.currentVars = paramVars
        ctx.INPUT_ROW = null
        body.genCode(ctx)
      } finally {
        ctx.currentVars = oldVars
        ctx.INPUT_ROW = oldRow
      }
    val isNullGlobal = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "outlineIsNull")
    val retType = CodeGenerator.javaType(dataType)
    val fnName = ctx.freshName("outlined")
    val paramDecl = params.map { case (v, n, jt, _) => s"$jt $v, boolean $n" }.mkString(", ")
    val fn = ctx.addNewFunction(fnName,
      s"""
         |private $retType $fnName($paramDecl) {
         |  ${bodyCode.code}
         |  $isNullGlobal = ${bodyCode.isNull};
         |  return ${bodyCode.value};
         |}
       """.stripMargin)
    val args = inputCodes.map(c => s"${c.value}, ${c.isNull}").mkString(", ")
    val inputEval = inputCodes.map(_.code).foldLeft(code"")(_ + _)
    ev.copy(code =
      code"""
            |$inputEval
            |$retType ${ev.value} = $fn($args);
            |boolean ${ev.isNull} = $isNullGlobal;
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Outline =
    copy(inputs = newChildren.init, body = newChildren.last)
}

object Outline {
  /** Builds an outlined column: `build` receives one Column per input, each
    * backed by a positional `BoundReference`, and returns the tree to
    * outline. Input nullability is conservatively `true` (the tree handles
    * nulls itself, exactly as it would inline).
    */
  def apply(inputs: Seq[(Column, DataType)])(build: Seq[Column] => Column): Column = {
    val refs = inputs.zipWithIndex.map { case ((_, dt), i) =>
      Shims.column(BoundReference(i, dt, nullable = true))
    }
    Shims.column(Outline(inputs.map(c => Shims.expression(c._1)),
      Shims.expression(build(refs))))
  }
}
