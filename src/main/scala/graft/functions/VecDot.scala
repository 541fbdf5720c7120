package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over numeric array columns (float or double
  * elements, mixed allowed; both upcast to double) — the embedding-ANN
  * hot path.
  *
  * The `aggregate(zip_with(...))` formulation this replaces evaluates
  * its lambdas INTERPRETED (higher-order functions don't participate in
  * whole-stage codegen); `doGenCode` here emits a primitive accumulation
  * loop inside the fused pipeline. Accumulation order (sequential
  * left-to-right) and per-element upcasts match the HOF form exactly, so
  * results are bit-identical.
  *
  * Elements are assumed non-null; the shorter length bounds the loop
  * (embedding columns are fixed-dimension in practice).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    val la = elemType(left) == FloatType
    val lb = elemType(right) == FloatType
    val n = math.min(aa.numElements(), bb.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val x = if (la) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (lb) bb.getFloat(i).toDouble else bb.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String, e: Expression): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += ${getter(a, i, left)} * ${getter(b, i, right)};
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    ExpressionBridge.column(
      VecDot(ExpressionBridge.expression(a), ExpressionBridge.expression(b)))
}
