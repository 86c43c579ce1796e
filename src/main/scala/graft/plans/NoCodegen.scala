package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.DataType

/** Identity wrapper that forces its operator OUT of whole-stage codegen.
  *
  * `CollapseCodegenStages` refuses to fuse any operator whose expressions
  * contain a `CodegenFallback`, so wrapping ONE projected column unfuses
  * the whole projection from its neighbors — each side still codegens on
  * its own.
  *
  * Why this exists (round 10): at fleet DBC width (>150 signals) the
  * struct-combine tumbling aggregate plans as `SortAggregateExec`
  * (struct-typed `min/max` buffers are neither UnsafeRow-mutable nor
  * `TypedImperativeAggregate`), and its map-side `SortExec` fuses with the
  * 513-column decode projection into ONE generated class past Spark's
  * 1 MB nested-class spill threshold — the spilled `sort_addToSorter`
  * touches `BufferedRowIterator.partitionIndex` across Janino's
  * nested-class boundary and throws `IllegalAccessError` at RUNTIME
  * (observed; the plan compiles and even explains cleanly). A fusion
  * barrier next to the huge projection keeps the sort span small. The
  * barrier costs one interpreted identity projection, used only on paths
  * where the neighboring aggregate is interpreted anyway (tiny winner
  * sets, or the documented wide-struct fallback).
  */
case class NoCodegen(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(newChild: Expression): NoCodegen =
    copy(child = newChild)
}

object NoCodegen {
  /** Column form: `noCodegen(col)` is `col`, minus whole-stage fusion. */
  def apply(c: Column): Column = Shims.column(NoCodegen(Shims.expression(c)))
}
