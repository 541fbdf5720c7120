package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE encode (the GPT-2 byte encoder recipe, Radford et
  * al. 2019 §2.2 / the public `bytes_to_unicode` construction): every
  * UTF-8 byte of a word maps through a fixed reversible 256-entry
  * byte→printable-codepoint alphabet, and the learned merges
  * ([[graft.llmdata.ByteBpe.train]]) join adjacent byte symbols. The
  * payoff over the code-point families (BPE/Unigram/WordPiece): ZERO
  * out-of-vocabulary tokens BY CONSTRUCTION — any text in any script
  * (or binary-ish content) decomposes to its byte symbols even with an
  * empty merge table, and no delimiter/newline fallback branch exists
  * because '|', '\n', '\r', and every other troublesome byte map to
  * non-delimiter surrogates before the state is built.
  *
  * House alphabet (one divergence from GPT-2's table, documented):
  * printable bytes map to themselves EXCEPT 124 ('|'), which would
  * collide with the house `|state|` delimiter; it diverts to the
  * 256+k surrogate range with the other non-printables. The mapping
  * stays a bijection, which is all byte-level BPE requires.
  *
  * Tokens are surrogate-alphabet strings (what a byte-level vocabulary
  * actually stores); they concatenate back to the word's surrogate
  * form, and [[ByteBpeEncode.decode]] inverts to the original bytes.
  * Merge application is the house bounded-pass replace
  * ([[BpeTokenCount.applyRank]]) so all four tokenizer families share
  * one merge semantics; the DuckDB oracle replays the byte expansion
  * with pure code-point arithmetic and a 256-char map literal.
  */
case class ByteBpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_bpe_encode"

  @transient private lazy val patReps: Array[Array[String]] =
    merges.map { case (l, r) => Array(s"|$l|$r|", s"|$l$r|") }.toArray

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ByteBpeEncode.encode(input.asInstanceOf[UTF8String].toString, patReps)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("byteBpeMerges", patReps,
      "java.lang.String[][]")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ByteBpeEncode.encode($c.toString(), $tableRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeEncode =
    copy(child = newChild)
}

object ByteBpeEncode {

  /** byte value → surrogate code point (single UTF-16 char each: all
    * surrogates < U+0200). Printable bytes (33–126 minus '|'=124,
    * 161–172, 174–255) keep their own code point; the 69 others take
    * 256+k in ascending byte order — the GPT-2 construction with the
    * one documented '|' divergence.
    */
  val alphabet: Array[Char] = {
    val keep = ((33 to 126).toSet - 124) ++ (161 to 172) ++ (174 to 255)
    val out = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  /** surrogate char → byte value (inverse of [[alphabet]]). */
  private val inverse: Map[Char, Int] =
    alphabet.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** The word's surrogate form: one alphabet char per UTF-8 byte. */
  def surrogates(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(alphabet(bytes(i) & 0xFF))
      i += 1
    }
    sb.toString
  }

  /** Initial `|s1|s2|…|` state over the word's byte surrogates
    * ("" → "|" → 0 tokens). Never needs a fallback: no surrogate is
    * the delimiter.
    */
  def byteState(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 2 + 1)
    sb.append('|')
    var i = 0
    while (i < bytes.length) {
      sb.append(alphabet(bytes(i) & 0xFF)).append('|')
      i += 1
    }
    sb.toString
  }

  /** Invert a token stream back to the original word bytes (spec
    * surface — proves the alphabet is a bijection end-to-end).
    */
  def decode(tokens: Seq[String]): String = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    tokens.foreach(_.foreach(c => buf += inverse(c).toByte))
    new String(buf.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Full-document encode: single-space word split (the house
    * [[BpeTokenCount]] convention, empties contribute nothing), each
    * word's byte state merged through the learned ranks, tokens in
    * (word, within-word) order.
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
          var state = byteState(w)
          var r = 0
          while (r < patReps.length) {
            state = BpeTokenCount.applyRank(state, patReps(r)(0),
              patReps(r)(1))
            r += 1
          }
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
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  def apply(col: Column, merges: Seq[(String, String)]): Column =
    ExpressionBridge.column(
      ByteBpeEncode(ExpressionBridge.expression(col), merges))
}
