package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFKC/NFD/NFKD) as a native codegen
  * expression — the canonicalization step every dedup/tokenization
  * pipeline needs before hashing text: visually-identical strings with
  * different codepoint sequences ("é" precomposed vs "e"+U+0301) would
  * otherwise land in different exact/MinHash buckets and defeat
  * deduplication.
  *
  * Spark has no built-in for this; the JDK's `java.text.Normalizer` is
  * deterministic and ships everywhere, so the expression stays a
  * single whole-stage-codegen call — no UDF boxing, no Python. The
  * helper short-circuits through `Normalizer.isNormalized`, which is a
  * cheap scan (true for all-ASCII in one pass), so the dominant
  * already-normalized corpus path allocates nothing.
  *
  * DuckDB's `nfc_normalize` replays the NFC form exactly (both
  * implement the Unicode standard's canonical composition), which is
  * what lets the `qt_normalize` gate hash-compare results.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  private val normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"UnicodeNormalize requires a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], normForm.name())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.plans.UnicodeNormalize.normalize($c, "${normForm.name()}")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Codegen/eval helper. The dominant corpus path — pure-ASCII text,
    * which is normalized under every form — is detected on the RAW UTF-8
    * bytes (one branchy scan, no String copy, no enum lookup), so it is
    * genuinely allocation-free. Only non-ASCII rows pay the
    * String materialization + `isNormalized` check + (rarely) the
    * normalization itself.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    var i = 0
    val n = s.numBytes
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val f = Normalizer.Form.valueOf(form)
    val j = s.toString
    if (Normalizer.isNormalized(j, f)) s
    else UTF8String.fromString(Normalizer.normalize(j, f))
  }

  /** NFC canonical composition — the dedup-canonicalization default. */
  def nfc(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFC"))

  /** NFKC compatibility composition — folds ligatures/width variants
    * (ﬁ→fi, full-width→ASCII); the aggressive tokenizer-prep form.
    */
  def nfkc(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFKC"))
}
