package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the Gopher-style repetition
  * signals (Rae et al. 2021, arXiv:2112.11446 Table A1 — public) for
  * one document in ONE pass: word-n-gram repetition and duplicate-line
  * statistics, as `array<long>`:
  *
  * `[top_ngram_score, dup_ngram_chars, total_chars,
  *   n_lines, n_distinct_lines, dup_line_count, dup_line_chars,
  *   total_line_chars]`
  *
  * - `top_ngram_score` = max over distinct word n-grams of
  *   `count(g) * chars(g)` — the numerator of the "fraction of
  *   characters in the most common n-gram" filter (taking the max of
  *   the product makes the statistic deterministic under count ties).
  * - `dup_ngram_chars` = sum over distinct n-grams occurring ≥ 2 times
  *   of `count(g) * chars(g)` — the (overlap-double-counting, hence
  *   capped-at-1 downstream) numerator of "fraction of characters in
  *   duplicated n-grams".
  * - line statistics split on the LITERAL `lineSep` (empties kept,
  *   like `string_split`): occurrences of a line value appearing more
  *   than once count toward `dup_line_count`/`dup_line_chars`.
  *
  * Token semantics mirror [[TokenStats]] (`split(text, " ")`, empties
  * kept); all char counts are Unicode code points like `length()`.
  * Because consecutive tokens are separated by exactly one space, an
  * n-gram joined by `' '` is a substring of the original text — the
  * kernel never builds gram strings, it slices them.
  *
  * Per-row cost is O(tokens + distinct grams) time and O(distinct
  * grams) transient memory — scan-fused, shuffle-free, codegen'd; the
  * scale path for repetition filtering 100 TB of raw documents.
  * (Beyond the reference's surface; its text module stops at
  * vectorizers — feature_extraction/text.py.)
  */
case class RepetitionStats(child: Expression, n: Int, lineSep: String)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")
  require(lineSep.nonEmpty, "lineSep must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String].toString, n, lineSep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("repetitionLineSep", lineSep, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionStats.compute($c.toString(), $n, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  final val TOP_NGRAM_SCORE = 1
  final val DUP_NGRAM_CHARS = 2
  final val TOTAL_CHARS = 3
  final val N_LINES = 4
  final val N_DISTINCT_LINES = 5
  final val DUP_LINE_COUNT = 6
  final val DUP_LINE_CHARS = 7
  final val TOTAL_LINE_CHARS = 8

  def compute(text: String, n: Int, lineSep: String): ArrayData = {
    // ---- token boundaries (split on every single space, empties kept)
    val len = text.length
    var nTokens = 1
    var i = 0
    while (i < len) { if (text.charAt(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var tok = 0; var start = 0
    i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        starts(tok) = start; ends(tok) = i; tok += 1; start = i + 1
      }
      i += 1
    }

    // ---- n-gram counts over text slices (join-by-space == substring)
    var topScore = 0L
    var dupChars = 0L
    if (nTokens >= n) {
      val counts = new java.util.HashMap[String, Long]()
      var g = 0
      while (g <= nTokens - n) {
        val gram = text.substring(starts(g), ends(g + n - 1))
        counts.put(gram, counts.getOrDefault(gram, 0L) + 1L)
        g += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val chars = e.getKey.codePointCount(0, e.getKey.length).toLong
        val score = e.getValue * chars
        if (score > topScore) topScore = score
        if (e.getValue >= 2) dupChars += score
      }
    }

    // ---- duplicate-line statistics (literal separator, empties kept)
    val lineCounts = new java.util.HashMap[String, Long]()
    var from = 0
    var done = false
    while (!done) {
      val idx = text.indexOf(lineSep, from)
      val end = if (idx < 0) len else idx
      val line = text.substring(from, end)
      lineCounts.put(line, lineCounts.getOrDefault(line, 0L) + 1L)
      if (idx < 0) done = true else from = idx + lineSep.length
    }
    var nLines = 0L; var dupLineCount = 0L; var dupLineChars = 0L
    var totalLineChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      val chars = e.getKey.codePointCount(0, e.getKey.length).toLong
      nLines += e.getValue
      totalLineChars += e.getValue * chars
      if (e.getValue > 1) {
        dupLineCount += e.getValue
        dupLineChars += e.getValue * chars
      }
    }

    new GenericArrayData(Array(
      topScore, dupChars, text.codePointCount(0, len).toLong,
      nLines, lineCounts.size.toLong, dupLineCount, dupLineChars,
      totalLineChars))
  }

  def apply(col: Column, n: Int, lineSep: String): Column =
    ExpressionBridge.column(
      RepetitionStats(ExpressionBridge.expression(col), n, lineSep))
}
