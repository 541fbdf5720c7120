package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy hitters over a string column: the MERGEABLE Misra–Gries
  * summary (Misra/Gries '82; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12) with k counters.
  *
  * Guarantees, independent of partitioning/merge order: every item with
  * true frequency > n/(k+1) appears in the output, and each reported
  * count is an UNDERESTIMATE by at most n/(k+1). That makes it the
  * scale tool for corpus boilerplate/vocabulary analysis — a 100 TB
  * token stream reduces to k counters per partition, merged pairwise,
  * where an exact groupBy would shuffle the full token stream.
  *
  * Output: `array<struct<item string, count bigint>>` sorted by count
  * desc then item asc. Counts are the MG lower bounds, not exact —
  * join the (tiny) result against an exact count of just those items
  * when exact figures are needed (see LlmDataQueries.q_heavy_tokens).
  */
case class FreqItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_items needs a string column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: known item +1; free slot → insert; full → decrement
    * all (dropping zeros) instead of inserting.
    */
  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item.clone(), 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: sum counts, then if over k entries
    * subtract the (k+1)-th largest count from everything and drop
    * non-positives — preserves the n/(k+1) error bound.
    */
  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItems =
    copy(child = newChildren(0))
}

object FreqItems {
  /** Aggregate Column: `array<struct<item, count>>`, count desc. */
  def apply(item: Column, k: Int): Column =
    ExpressionBridge.column(
      FreqItems(ExpressionBridge.expression(item), k).toAggregateExpression())
}
