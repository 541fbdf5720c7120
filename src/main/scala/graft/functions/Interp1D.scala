package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for 1-D linear interpolation into a fixed
  * knot table (`np.interp(x, xs, ys)` with constant-extrapolated ends) —
  * the QuantileTransformer hot path (SURVEY §4's planned `interp1d`
  * expression).
  *
  * Versus a Scala UDF: `doGenCode` emits a direct static call inside the
  * WholeStageCodegen pipeline — no encoder boxing, no UDF
  * null-wrapping, the surrounding projection stays one fused codegen
  * span. The knot arrays ride along as referenced objects (shared per
  * task, zero per-row allocation).
  */
case class Interp1D(child: Expression, xs: Array[Double], ys: Array[Double])
    extends UnaryExpression {
  require(xs.length == ys.length && xs.length >= 2, "need >= 2 knots")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "interp1d"

  override protected def nullSafeEval(input: Any): Any =
    Interp1D.interp(input.asInstanceOf[Double], xs, ys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xsRef = ctx.addReferenceObj("interpXs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("interpYs", ys, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Interp1D.interp($c, $xsRef, $ysRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Interp1D =
    copy(child = newChild)
}

object Interp1D {
  /** Binary-search linear interpolation; ends clamp to ys head/last
    * (numpy semantics). Called from both interpreted eval and the
    * generated code.
    */
  def interp(x: Double, xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length
    if (x <= xs(0)) return ys(0)
    if (x >= xs(n - 1)) return ys(n - 1)
    var lo = 0; var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid
    }
    if (xs(hi) == xs(lo)) ys(lo)
    else ys(lo) + (ys(hi) - ys(lo)) * (x - xs(lo)) / (xs(hi) - xs(lo))
  }

  /** Column surface: interp1d(col, xs, ys). */
  def apply(col: Column, xs: Array[Double], ys: Array[Double]): Column =
    ExpressionBridge.column(Interp1D(ExpressionBridge.expression(col), xs, ys))
}
