package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained unigram-LM piece table (Kudo, arXiv:1804.10959 — the
  * SentencePiece unigram family): pieces with integer micro-unit
  * log-prob scores (round(ln p · 1e6), the house integer-weight
  * convention) plus the out-of-vocabulary single-character score.
  * Rides [[UnigramEncode]] as a codegen reference object; serializable
  * so the broadcast task closure carries one copy per executor.
  */
final class UnigramModel(val pieces: Array[String],
    val scores: Array[Long], val unkScore: Long)
    extends java.io.Serializable {
  require(pieces.length == scores.length)
  @transient lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
    m
  }
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p =>
      p.codePointCount(0, p.length)).max
}

/** Native codegen expression: Viterbi unigram-LM subword tokenization
  * of a document against a LEARNED piece table (Kudo 2018, the
  * SentencePiece unigram family — the other production tokenizer
  * besides BPE, learned in-repo by [[graft.llmdata.Unigram.train]]).
  *
  * Semantics, chosen to be EXACTLY mirrorable in the DuckDB oracle:
  *  - words are `split(text, " ")` tokens (single-space split, empties
  *    contributing no tokens — the house [[BpeTokenCount]] convention);
  *  - per word, the max-score segmentation over Unicode code points
  *    under INTEGER piece scores: dp[j] = max over piece lengths
  *    L = 1..maxLen of dp[j−L] + score(w[j−L..j]), where a
  *    single-code-point span absent from the table scores `unkScore`
  *    (full coverage — every position is reachable);
  *  - ties broken toward the LONGER piece at every position (both the
  *    forward argmax here and the oracle's backward equality pick walk
  *    the same longest-L-first rule, so the reconstructed path is
  *    identical even when two segmentations share the optimum);
  *  - integer scores make the DP exact cross-engine — no float
  *    comparison anywhere.
  *
  * Unlike BPE there is NO delimiter/newline fallback branch: the DP
  * never builds a `|`-state string and the oracle reconstructs via
  * substring spans, so any character stream tokenizes uniformly.
  */
case class UnigramEncode(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      UnigramEncode.encode(input.asInstanceOf[UTF8String].toString, model)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      "graft.functions.UnigramModel")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.UnigramEncode.encode($c.toString(), $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  /** Viterbi segmentation of one word (code-point spans, integer
    * scores, longest-piece tie-break). Returns pieces in order; they
    * concatenate back to the word.
    */
  def wordPieces(w: String, model: UnigramModel): Array[String] = {
    if (w.isEmpty) return Array.empty
    val cps = w.codePoints().toArray
    val n = cps.length
    val k = math.max(1, model.maxLen)
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var best = Long.MinValue
      var bestL = 0
      var l = 1
      val lmax = math.min(k, j)
      while (l <= lmax) {
        val piece = new String(cps, j - l, l)
        val sc = model.lookup.get(piece)
        val s: Long =
          if (sc != null) sc.longValue()
          else if (l == 1) model.unkScore
          else Long.MinValue
        if (s != Long.MinValue) {
          val v = dp(j - l) + s
          // ties go to the longer piece: iterate L ascending, replace on >=
          if (bestL == 0 || v >= best) { best = v; bestL = l }
        }
        l += 1
      }
      dp(j) = best
      back(j) = bestL
      j += 1
    }
    // walk back, then reverse
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      out += new String(cps, p - l, l)
      p -= l
    }
    out.reverse.toArray
  }

  /** Whole-document encode: words in order, within-word pieces in
    * order (`encode(t).length` is the document's unigram token count).
    */
  def encode(text: String, model: UnigramModel): Array[UTF8String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        val w = text.substring(start, i)
        if (w.nonEmpty) {
          val ps = wordPieces(w, model)
          var j = 0
          while (j < ps.length) { out += UTF8String.fromString(ps(j)); j += 1 }
        }
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  def apply(col: Column, model: UnigramModel): Column =
    ExpressionBridge.column(UnigramEncode(ExpressionBridge.expression(col), model))
}
