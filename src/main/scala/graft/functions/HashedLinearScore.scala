package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-fused linear scorer over hashed bag-of-words features
  * (fastText-style; Joulin et al. arXiv:1607.01759): because the
  * feature vector is the bucket-count histogram of the document's
  * tokens, the margin `w·x + b` collapses to
  * `b + Σ_tokens w[bucket(token)]` — ONE pass over the tokens, no
  * feature vector ever materialized, no shuffle. The learned weights
  * ride the expression as a reference object (plan literals in
  * spirit); one static call per row inside WholeStageCodegen.
  *
  * The bucket is the house md5 trick so the oracle can mirror it
  * exactly: first 15 hex chars of md5(token) as a 60-bit integer,
  * mod the bucket count — `('0x'||substr(md5(t),1,15))::BIGINT % D`
  * in DuckDB, `conv(substring(md5(t),1,15),16,10) % D` in Spark SQL.
  * Tokens are `split(text, " ")` (empties kept — house convention).
  */
case class HashedLinearScore(child: Expression, weights: Seq[Double],
    intercept: Double) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_linear_score"

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    HashedLinearScore.compute(input.asInstanceOf[UTF8String].toString,
      wArr, intercept)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hashedLinearWeights", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedLinearScore.compute($c.toString(), $wRef, $intercept)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit value of the first 15 md5 hex chars = first 8 digest bytes
    * as an unsigned big-endian 64-bit value, dropping the 16th hex
    * nibble (`>>> 4`). Always non-negative, so `% d` is too.
    */
  def bucket(token: String, d: Int): Int = {
    val dig = md5.get()
    dig.reset()
    val h = dig.digest(token.getBytes("UTF-8"))
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
    ((v >>> 4) % d).toInt
  }

  def compute(text: String, w: Array[Double], intercept: Double): Double = {
    val d = w.length
    var acc = intercept
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        acc += w(bucket(text.substring(start, i), d))
        start = i + 1
      }
      i += 1
    }
    acc
  }

  def apply(col: Column, weights: Seq[Double], intercept: Double): Column =
    ExpressionBridge.column(
      HashedLinearScore(ExpressionBridge.expression(col), weights, intercept))
}
