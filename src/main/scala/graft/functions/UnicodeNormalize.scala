package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (UAX #15) —
  * the canonical first step of a text-cleaning pipeline (the reference
  * corpora normalize before tokenizing; CCNet/fastText pipelines run
  * NFD/NFKC strips). Spark ships no normalization builtin, so without
  * this the operation falls to a Scala UDF and breaks the codegen span.
  *
  * `doGenCode` emits a static call inside WholeStageCodegen (same
  * design as [[NormalPpf]]); the static path quick-checks
  * `Normalizer.isNormalized` first, so already-normalized text (all
  * ASCII, in particular) passes through without allocating. The `form`
  * is a constructor parameter — plan-literal, like every other
  * expression config in this package.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeNormalize.forms.contains(form),
    s"unicode_normalize: form must be one of ${UnicodeNormalize.forms.mkString("/")}, got $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Called from interpreted eval and from the generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  /** Column surface: unicode_normalize(col, "NFC"). */
  def apply(col: Column, form: String = "NFC"): Column =
    ExpressionBridge.column(
      UnicodeNormalize(ExpressionBridge.expression(col), form))
}
