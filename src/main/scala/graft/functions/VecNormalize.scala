package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** L2-normalize a float/double array to a unit double array — the
  * embedding-pipeline preprocessing step before cosine ANN (after
  * normalization, cosine reduces to a plain dot product).
  *
  * A `transform(vec, x -> x / norm)` HOF evaluates its lambda
  * INTERPRETED per element per corpus row; this expression emits one
  * fused primitive loop via `doGenCode` like [[VecDot]]. Zero vectors
  * pass through unchanged (norm 0 → no division), matching sklearn's
  * `normalize` semantics.
  *
  * Like [[VecDot]], elements are assumed NON-NULL (embedding columns
  * are dense fixed-dimension vectors in practice); a null element would
  * read as 0.0, not propagate.
  */
case class VecNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_normalize"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    if (norm > 0.0) {
      i = 0
      while (i < n) { out(i) /= norm; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter =
      if (isFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = ${getter(a, i)};
         |  $s += $out[$i] * $out[$i];
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |if ($nrm > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] /= $nrm; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
}

object VecNormalize {
  def apply(col: Column): Column =
    ExpressionBridge.column(VecNormalize(ExpressionBridge.expression(col)))
}
