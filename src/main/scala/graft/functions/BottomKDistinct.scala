package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types._

/** Bounded k-minimum-values aggregate: keeps the k smallest DISTINCT
  * BIGINT values seen, as a capped sorted set merged map-side — the
  * state of a KMV/theta distinct-count sketch (Bar-Yossef, Jayram,
  * Kumar, Sivakumar & Trevisan, RANDOM'02; the bottom-k form surveyed
  * by Beyer et al. SIGMOD'07 and productionized as the Apache
  * DataSketches theta sketch).
  *
  * Distinctness is part of the CONTRACT, not a convenience: a KMV
  * estimator reads the k-th smallest value of the distinct hash SET —
  * a [[TopKByScore]]-style heap without the membership check would let
  * a hot key occupy several of the k slots and evict genuinely smaller
  * distinct values, biasing the threshold high. Here duplicates are
  * dropped on insert, so the buffer is a pure function of the distinct
  * value set — bit-identical under any partitioning or merge tree (the
  * DDSketch mergeability argument), which is what lets a DuckDB oracle
  * replay the sketch frame exactly.
  *
  * As a TypedImperativeAggregate the partial (map-side) phase reduces
  * each partition's contribution to ≤ k values per group before the
  * shuffle; the final merge is a ≤ k·nPartitions set union. Output:
  * `array<bigint>` ascending (so `element_at(.., k)` is the KMV
  * threshold and `size(..)` the exact-count fallback test).
  */
case class BottomKDistinct(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKDistinct.Buffer] {

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_distinct"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bottom_k_distinct value must be bigint, got ${value.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BottomKDistinct.Buffer =
    new BottomKDistinct.Buffer(k)

  override def update(buf: BottomKDistinct.Buffer, input: InternalRow): BottomKDistinct.Buffer = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKDistinct.Buffer, other: BottomKDistinct.Buffer): BottomKDistinct.Buffer = {
    other.foreach(buf.add)
    buf
  }

  override def eval(buf: BottomKDistinct.Buffer): Any =
    new GenericArrayData(buf.sortedAscending.map(Long.box).toArray[Any])

  override def serialize(buf: BottomKDistinct.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKDistinct.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var r = 0
    while (r < n) { buf.add(in.readLong()); r += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(value = newChildren(0))
}

object BottomKDistinct {

  /** Capped sorted set: ≤ k distinct longs, O(log k) insert/evict. */
  final class Buffer(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def size: Int = set.size

    def add(v: Long): Unit = {
      if (set.size < k) { set.add(v); () }
      else if (v < set.last && !set.contains(v)) {
        set.add(v)
        set.remove(set.last)
        ()
      }
    }

    def foreach(f: Long => Unit): Unit = {
      val it = set.iterator()
      while (it.hasNext) f(it.next().longValue())
    }

    def sortedAscending: Seq[Long] = {
      val b = Seq.newBuilder[Long]
      foreach(b += _)
      b.result()
    }
  }

  /** Aggregate Column: ascending `array<bigint>` of the k smallest
    * distinct values. */
  def apply(value: Column, k: Int): Column =
    ExpressionBridge.column(
      BottomKDistinct(ExpressionBridge.expression(value), k)
        .toAggregateExpression())
}
