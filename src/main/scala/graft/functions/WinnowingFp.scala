package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ExpressionBridge

/** Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
  * MOSS algorithm) in ONE string pass: char-k-gram 60-bit md5 hashes,
  * sliding-window-w minimum with the paper's rightmost-tie rule, as a
  * native expression returning array<struct<pos, fp>> (distinct, in
  * position order).
  *
  * This replaces the per-position explode (len−k+1 rows per document)
  * plus THREE per-document windows (rolling struct-min, trailing
  * count, row_number) of the relational formulation — the whole
  * selection becomes a scan-fused map with zero shuffle and zero
  * sort; the caller just posexplodes the (tiny, density-2/(w+1))
  * result. The rolling minimum is the standard monotonic deque
  * (amortized O(1) per position); ties pop from the back so the
  * RIGHTMOST minimal hash survives, matching min(struct(h, −p)).
  *
  * Hash parity: md5 of the gram's UTF-8 bytes, first 15 hex chars as
  * a long — bit-identical to the repo's
  * `conv(substring(md5(substr(text, p+1, k)), 1, 15), 16, 10)` and to
  * the DuckDB oracle. Grams index by CODE POINT (Spark `substr`
  * semantics), not UTF-16 unit.
  */
case class WinnowingFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, s"k=$k and w=$w must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnowing_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnowing_fp needs a string column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    WinnowingFp.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowingFp.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFp =
    copy(child = newChild)
}

object WinnowingFp {

  def apply(text: Column, k: Int, w: Int): Column =
    ExpressionBridge.column(WinnowingFp(ExpressionBridge.expression(text), k, w))

  /** 60-bit md5 of a string's UTF-8 bytes — first 15 hex chars as a
    * long, identical to conv(substring(md5(s),1,15),16,10).
    */
  private def h60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = first 7 bytes + the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(text: String, k: Int, w: Int): ArrayData = {
    val cps = text.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](n)
    val sb = new java.lang.StringBuilder(k * 2)
    var p = 0
    while (p < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) { sb.appendCodePoint(cps(p + j)); j += 1 }
      hashes(p) = h60(md, sb.toString)
      p += 1
    }
    val out = new java.util.ArrayList[Any]()
    var lastPos = -1L
    def select(pos: Int): Unit =
      if (pos.toLong != lastPos) { // distinct: same (pos, fp) reselected
        lastPos = pos.toLong
        out.add(InternalRow(pos.toLong, hashes(pos)))
      }
    if (n <= w) {
      // single short window: rightmost minimal hash over all positions
      var best = 0
      var i = 1
      while (i < n) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      select(best)
    } else {
      // monotonic deque of indices, hashes strictly increasing front to
      // back; equal hashes pop so the rightmost occurrence survives
      val deque = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      var i = 0
      while (i < n) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        val start = i - w + 1
        if (start >= 0) {
          while (deque(head) < start) head += 1
          select(deque(head))
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
