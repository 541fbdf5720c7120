package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression counting byte-pair-encoding subword tokens
  * per document against a LEARNED merge table (Sennrich et al.,
  * arXiv:1508.07909 — the public BPE recipe; merges learned in-repo by
  * [[graft.llmdata.Bpe.train]]). Replaces the chars/4 heuristic
  * ([[TokenStats]] N_BPE) wherever true subword counts matter (sequence
  * packing, mixture token budgeting).
  *
  * Semantics, chosen to be EXACTLY mirrorable in the DuckDB oracle:
  *  - words are `split(text, " ")` tokens (single-space split, empties
  *    kept and contributing 0 — the house [[TokenStats]] convention);
  *  - each word becomes the delimited symbol state `|c1|c2|…|` over its
  *    Unicode code points;
  *  - merge ranks apply in learned order, each as AT MOST
  *    [[BpeTokenCount.MaxPasses]] left-to-right non-overlapping
  *    string-replace passes of `|l|r|` → `|lr|` (a pass can leave a
  *    boundary-shared occurrence behind, so passes repeat to the
  *    fixpoint; 8 passes reach it for words up to 2^8 symbols, and both
  *    engines stop at the same pass count so even a pathological longer
  *    word tokenizes identically). A later merge can never reactivate
  *    an earlier rank — a merged symbol only appears in merges learned
  *    after it — so one ordered sweep IS the min-rank-first loop;
  *  - a word containing the delimiter '|' (or a newline, which the
  *    oracle's non-dotall char regexp couldn't split) falls back to one
  *    token per code point (same CASE in the oracle).
  *
  * The word count is `separators − 1` of the final state. The merge
  * table rides the expression as a reference object — one static call
  * per row inside WholeStageCodegen, no UDF.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  /** Precompiled [pattern, replacement] pairs in rank order. */
  @transient private lazy val patReps: Array[Array[String]] =
    merges.map { case (l, r) => Array(s"|$l|$r|", s"|$l$r|") }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.compute(input.asInstanceOf[UTF8String].toString, patReps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", patReps, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeTokenCount.compute($c.toString(), $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Max replace passes per rank (see class doc). */
  final val MaxPasses = 8

  def compute(text: String, patReps: Array[Array[String]]): Int = {
    var total = 0
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        total += wordTokens(text.substring(start, i), patReps)
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Initial `|c1|c2|…|` state over code points ("" → "|" → 0 tokens). */
  def initState(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 1)
    sb.append('|')
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp).append('|')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** One rank applied to (bounded) fixpoint — shared by scoring and
    * training so the whole system has ONE merge semantics.
    */
  def applyRank(state0: String, pat: String, rep: String): String = {
    var state = state0
    var p = 0
    while (p < MaxPasses && state.contains(pat)) {
      state = state.replace(pat, rep)
      p += 1
    }
    state
  }

  def mergedState(w: String, patReps: Array[Array[String]]): String = {
    var state = initState(w)
    var r = 0
    while (r < patReps.length) {
      state = applyRank(state, patReps(r)(0), patReps(r)(1))
      r += 1
    }
    state
  }

  def wordTokens(w: String, patReps: Array[Array[String]]): Int = {
    if (w.isEmpty) return 0
    // delimiter would corrupt the state; newlines can't cross the
    // oracle's regexp char-split ('.' is not dotall there) — both fall
    // back to one token per code point, mirrored by the oracle CASE
    if (w.indexOf('|') >= 0 || w.indexOf('\n') >= 0 || w.indexOf('\r') >= 0)
      return w.codePointCount(0, w.length)
    val state = mergedState(w, patReps)
    var bars = 0
    var j = 0
    while (j < state.length) {
      if (state.charAt(j) == '|') bars += 1
      j += 1
    }
    bars - 1
  }

  def apply(col: Column, merges: Seq[(String, String)]): Column =
    ExpressionBridge.column(BpeTokenCount(ExpressionBridge.expression(col), merges))

  /** Full encode: the flattened subword token array of the document,
    * words in order, tokens in within-word order — same word split,
    * same merge semantics, same fallback as [[compute]] (so
    * `encode(...).length == compute(...)` always). Tokens of a word
    * concatenate back to the word: merges only join adjacent code
    * points, so the final state is a partition of the word.
    */
  def encode(text: String,
      patReps: Array[Array[String]]): Array[UTF8String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        val w = text.substring(start, i)
        if (w.nonEmpty) {
          if (w.indexOf('|') >= 0 || w.indexOf('\n') >= 0 ||
              w.indexOf('\r') >= 0) {
            // per-code-point fallback, as in wordTokens
            var j = 0
            while (j < w.length) {
              val cp = w.codePointAt(j)
              val n = Character.charCount(cp)
              out += UTF8String.fromString(w.substring(j, j + n))
              j += n
            }
          } else {
            val state = mergedState(w, patReps)
            var s = 1 // state starts with '|'
            var j = 1
            while (j < state.length) {
              if (state.charAt(j) == '|') {
                if (j > s) out += UTF8String.fromString(state.substring(s, j))
                s = j + 1
              }
              j += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }
}

/** Array-returning sibling of [[BpeTokenCount]]: the document's subword
  * tokens in order (see [[BpeTokenCount.encode]]).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val patReps: Array[Array[String]] =
    merges.map { case (l, r) => Array(s"|$l|$r|", s"|$l$r|") }.toArray

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeTokenCount.encode(input.asInstanceOf[UTF8String].toString, patReps)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", patReps, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.BpeTokenCount.encode($c.toString(), $tableRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def apply(col: Column, merges: Seq[(String, String)]): Column =
    ExpressionBridge.column(BpeEncode(ExpressionBridge.expression(col), merges))
}
