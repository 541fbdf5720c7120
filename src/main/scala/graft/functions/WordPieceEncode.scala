package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained WordPiece vocabulary (Schuster & Nakajima, ICASSP 2012; the
  * BERT tokenizer family — the third production subword family beside
  * BPE and the unigram LM): pieces are plain strings, continuation
  * pieces carry the literal `##` prefix. Rides [[WordPieceEncode]] as a
  * codegen reference object; serializable so the broadcast task closure
  * carries one copy per executor.
  */
final class WordPieceModel(val pieces: Array[String])
    extends java.io.Serializable {
  @transient lazy val lookup: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { s.add(pieces(i)); i += 1 }
    s
  }
  /** Longest piece SURFACE (code points, `##` marker excluded) — the
    * greedy matcher's lookback window; the oracle unrolls exactly this
    * many join arms per recursion step.
    */
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1
    else pieces.iterator.map { p =>
      val s = if (p.startsWith("##")) p.substring(2) else p
      math.max(1, s.codePointCount(0, s.length))
    }.max
}

/** Native codegen expression: greedy longest-match-first WordPiece
  * tokenization of a document against a LEARNED vocabulary (the BERT
  * `MaxMatch` algorithm — Schuster & Nakajima 2012; vocabulary learned
  * in-repo by [[graft.llmdata.WordPiece.train]]).
  *
  * Semantics, chosen to be EXACTLY mirrorable in the DuckDB oracle:
  *  - words are `split(text, " ")` tokens (single-space split, empties
  *    contributing no tokens — the house [[BpeTokenCount]] convention);
  *  - per word, scan left to right over Unicode code points: at each
  *    position take the LONGEST substring (≤ the vocabulary's max
  *    surface length) whose lookup key is in the vocabulary, where the
  *    key is the raw substring at word start and `##` + substring at
  *    every later position;
  *  - if NO length matches at some position, the WHOLE word becomes the
  *    single token `[UNK]` (the BERT whole-word-unk rule — partial
  *    matches before the failure are discarded);
  *  - greedy longest-first is deterministic by construction — no score
  *    comparison anywhere, so cross-engine exactness needs no
  *    quantization.
  *
  * Marker collision: a word containing `#` could alias a continuation
  * key ("`##ab`" at word start vs the piece `##ab`). Training filters
  * `#`-containing words from the word table and the oracle-gated path
  * feeds text sanitized of `#` (the q_bpe_encode sanitization
  * precedent); the expression itself stays total — any input tokenizes
  * deterministically.
  */
case class WordPieceEncode(child: Expression, model: WordPieceModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WordPieceEncode.encode(input.asInstanceOf[UTF8String].toString, model)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceModel", model,
      "graft.functions.WordPieceModel")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WordPieceEncode.encode($c.toString(), $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {

  val Unk = "[UNK]"

  /** Greedy longest-match segmentation of one word. Returns pieces in
    * order (continuations carry `##`); stripped of markers they
    * concatenate back to the word — or the single [[Unk]] token when
    * some position has no vocabulary match.
    */
  def wordPieces(w: String, model: WordPieceModel): Array[String] = {
    if (w.isEmpty) return Array.empty
    val cps = w.codePoints().toArray
    val n = cps.length
    val k = math.max(1, model.maxLen)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      var l = math.min(k, n - i)
      var found: String = null
      while (l >= 1 && found == null) {
        val surf = new String(cps, i, l)
        val key = if (i == 0) surf else "##" + surf
        if (model.lookup.contains(key)) found = key else l -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      i += l
    }
    out.toArray
  }

  /** Whole-document encode: words in order, within-word pieces in
    * order (`encode(t).length` is the document's WordPiece token
    * count; unmatched words count 1 via [[Unk]]).
    */
  def encode(text: String, model: WordPieceModel): Array[UTF8String] = {
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

  def apply(col: Column, model: WordPieceModel): Column =
    ExpressionBridge.column(WordPieceEncode(ExpressionBridge.expression(col), model))
}
