package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** RBF kernel strip against a fixed landmark matrix: per row x, the
  * m-vector `[exp(-gamma * ||x - landmark_i||^2)]_i` — the Nyström
  * B-strip kernel (Fowlkes et al. 2004; reference
  * cluster/spectral.py:250-262 computes it as blockwise
  * `pairwise_kernels`). This is the widest intermediate in the spectral
  * path, so it is a native codegen expression like [[VecDot]] rather
  * than an interpreted Seq[Double] UDF: the landmark matrix rides as a
  * task-shared referenced object, the loop runs on primitives inside
  * WholeStageCodegen, and the kernel math is bit-identical to the UDF
  * it replaces (same per-element loop and accumulation order).
  */
case class RbfKernelVec(child: Expression, landmarks: Array[Array[Double]],
    gamma: Double) extends UnaryExpression {
  require(landmarks.nonEmpty, "need at least one landmark")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rbf_kernel_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rbf_kernel_vec needs array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(RbfKernelVec.kernels(
      input.asInstanceOf[ArrayData], landmarks, gamma))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lmRef = ctx.addReferenceObj("nystromLandmarks", landmarks, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.RbfKernelVec.kernels($c, $lmRef, ${gamma}d));
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RbfKernelVec =
    copy(child = newChild)
}

object RbfKernelVec {
  /** Same loop the interpreted UDF ran: squared distance over the ROW's
    * length, then exp — shared by eval and generated code.
    */
  def kernels(arr: ArrayData, lms: Array[Array[Double]], gamma: Double): Array[Double] = {
    val n = arr.numElements()
    val m = lms.length
    val out = new Array[Double](m)
    var c = 0
    while (c < m) {
      val lm = lms(c)
      var s = 0.0
      var i = 0
      while (i < n) { val d = arr.getDouble(i) - lm(i); s += d * d; i += 1 }
      out(c) = java.lang.Math.exp(-gamma * s)
      c += 1
    }
    out
  }

  def apply(col: Column, landmarks: Array[Array[Double]], gamma: Double): Column =
    ExpressionBridge.column(
      RbfKernelVec(ExpressionBridge.expression(col), landmarks, gamma))
}

/** Nyström embedding map: kernel strip kv → k-vector
  * `e_j = (sum_i kv_i * proj(i)(j)) / sqrt(max(sum_i kv_i, 1e-12))`
  * (the degree-normalized extension, Fowlkes Eq. 16; reference
  * spectral.py:263-291). Composes with [[RbfKernelVec]] so the whole
  * per-row embedding is one fused codegen span with zero boxing; the
  * accumulation order matches the UDF it replaces exactly.
  */
case class NystromEmbed(child: Expression, proj: Array[Array[Double]])
    extends UnaryExpression {
  require(proj.nonEmpty && proj(0).nonEmpty, "empty projection")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "nystrom_embed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nystrom_embed needs array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(NystromEmbed.embed(
      input.asInstanceOf[ArrayData], proj))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val projRef = ctx.addReferenceObj("nystromProj", proj, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.NystromEmbed.embed($c, $projRef));
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NystromEmbed =
    copy(child = newChild)
}

object NystromEmbed {
  def embed(kv: ArrayData, proj: Array[Array[Double]]): Array[Double] = {
    val n = kv.numElements()
    var deg = 0.0
    var i = 0
    while (i < n) { deg += kv.getDouble(i); i += 1 }
    val inv = 1.0 / java.lang.Math.sqrt(java.lang.Math.max(deg, 1e-12))
    val k = proj(0).length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      i = 0
      while (i < n) { acc += kv.getDouble(i) * proj(i)(j); i += 1 }
      out(j) = acc * inv
      j += 1
    }
    out
  }

  def apply(col: Column, proj: Array[Array[Double]]): Column =
    ExpressionBridge.column(
      NystromEmbed(ExpressionBridge.expression(col), proj))
}
