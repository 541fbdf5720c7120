package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing every per-document token
  * statistic in ONE pass over the string:
  * `[n_tokens, total_token_chars, n_distinct, n_stopword_hits,
  * n_bpe_subwords]` as `array<long>`.
  *
  * The Column-HOF formulation (`aggregate`/`filter`/`array_distinct`
  * over `split`) evaluates interpreted lambdas per element and re-splits
  * the text once per statistic — five non-codegen passes per document.
  * Here `doGenCode` emits one static call inside WholeStageCodegen, and
  * because every TextStats column shares the same canonical TokenStats
  * child, codegen subexpression elimination computes it once per row no
  * matter how many stats a query projects.
  *
  * Token semantics mirror Spark's `split(text, " ")` exactly (split on
  * every single space, KEEPING empty tokens — limit −1); lengths count
  * Unicode code points like `length()`.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String].toString, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenStatsStopwords", stopSet,
      "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenStats.compute($c.toString(), $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  final val N_TOKENS = 1
  final val TOTAL_LEN = 2
  final val N_DISTINCT = 3
  final val N_STOP = 4
  final val N_BPE = 5

  /** One scan: tokens are maximal runs between single spaces (empty
    * tokens included, matching split(text, " ") with limit −1).
    */
  def compute(text: String, stop: java.util.HashSet[String]): ArrayData = {
    var nTokens = 0L; var totalLen = 0L; var nStop = 0L; var nBpe = 0L
    val seen = new java.util.HashSet[String]()
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        val tok = text.substring(start, i)
        val chars = tok.codePointCount(0, tok.length)
        nTokens += 1
        totalLen += chars
        nBpe += (chars + 3) / 4 // ceil(chars/4), 0 for empty
        if (stop.contains(tok)) nStop += 1
        seen.add(tok)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array(nTokens, totalLen, seen.size.toLong, nStop, nBpe))
  }

  def apply(col: Column, stopwords: Seq[String]): Column =
    ExpressionBridge.column(TokenStats(ExpressionBridge.expression(col), stopwords))
}
