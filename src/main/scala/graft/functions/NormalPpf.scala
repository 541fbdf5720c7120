package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the standard-normal inverse CDF
  * (Acklam's rational approximation, |ε| < 1.15e-9 — the public
  * algorithm scipy's norm.ppf fills the same role for in the
  * reference's QuantileTransformer(output_distribution="normal"),
  * preprocessing/data.py:399-418).
  *
  * Same design as [[Interp1D]]: `doGenCode` emits a static call inside
  * the WholeStageCodegen pipeline, so the normal-mode quantile
  * transform is UDF-free end to end — one fused codegen span per
  * column instead of a boxed-lambda boundary after the interpolation.
  * Input is clamped to [1e-7, 1 − 1e-7] (sklearn's BOUNDS_THRESHOLD
  * clip) so the tails stay finite.
  */
case class NormalPpf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "normal_ppf"

  override protected def nullSafeEval(input: Any): Any =
    NormalPpf.ppf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalPpf.ppf($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalPpf =
    copy(child = newChild)
}

object NormalPpf {
  private val clip = 1e-7

  /** Acklam's inverse-normal-CDF rational approximation, with the
    * sklearn boundary clip. Called from interpreted eval and from the
    * generated code.
    */
  def ppf(pRaw: Double): Double = {
    val p = math.min(math.max(pRaw, clip), 1 - clip)
    val plow = 0.02425
    if (p < plow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((-7.784894002430293e-03 * q + -3.223964580411365e-01) * q +
        -2.400758277161838e+00) * q + -2.549732539343734e+00) * q +
        4.374664141464968e+00) * q + 2.938163982698783e+00) /
        ((((7.784695709041462e-03 * q + 3.224671290700398e-01) * q +
          2.445134137142996e+00) * q + 3.754408661907416e+00) * q + 1)
    } else if (p <= 1 - plow) {
      val q = p - 0.5; val r = q * q
      (((((-3.969683028665376e+01 * r + 2.209460984245205e+02) * r +
        -2.759285104469687e+02) * r + 1.383577518672690e+02) * r +
        -3.066479806614716e+01) * r + 2.506628277459239e+00) * q /
        (((((-5.447609879822406e+01 * r + 1.615858368580409e+02) * r +
          -1.556989798598866e+02) * r + 6.680131188771972e+01) * r +
          -1.328068155288572e+01) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((-7.784894002430293e-03 * q + -3.223964580411365e-01) * q +
        -2.400758277161838e+00) * q + -2.549732539343734e+00) * q +
        4.374664141464968e+00) * q + 2.938163982698783e+00) /
        ((((7.784695709041462e-03 * q + 3.224671290700398e-01) * q +
          2.445134137142996e+00) * q + 3.754408661907416e+00) * q + 1)
    }
  }

  /** Column surface: normal_ppf(col). */
  def apply(col: Column): Column =
    ExpressionBridge.column(NormalPpf(ExpressionBridge.expression(col)))
}
