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

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken by ascending id), as a size-k binary heap
  * merged map-side.
  *
  * This replaces the `row_number().over(Window.partitionBy(group))`
  * top-k idiom, which ships EVERY candidate row of a group to a single
  * task and sorts it there — for brute-force ANN that is ~|corpus| rows
  * per query on one task, a straggler/OOM by construction at scale.
  * As a TypedImperativeAggregate the partial (map-side) phase reduces
  * each partition's contribution to ≤ k pairs per group before the
  * shuffle, so the exchange carries ≤ k·nPartitions rows per group and
  * the final merge is O(k·nPartitions·log k).
  *
  * Output: `array<struct<id, score>>` ordered best-first (score desc,
  * id asc) — `posexplode` it to recover (rank-1, neighbor). The result
  * is deterministic regardless of partitioning/merge order: the
  * comparison (score desc, id asc) is a total order when ids are
  * distinct within a group. Null scores are excluded (a window with
  * `desc` ordering would rank them last; they could only appear when a
  * group has fewer than k non-null candidates).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Buffer] {

  private def idType: DataType = id.dataType

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    } else if (score.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score score must be double, got ${score.dataType}")
    } else idType match {
      case LongType | IntegerType | DoubleType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score id must be bigint/int/double/string, got $other")
    }
  }

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k, idType)

  override def update(buf: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) {
        // rows are reused by the scan — copy variable-length ids
        val owned = i match {
          case u: UTF8String => u.clone()
          case other => other
        }
        buf.add(s.asInstanceOf[Double], owned)
      }
    }
    buf
  }

  override def merge(buf: TopKByScore.Buffer, other: TopKByScore.Buffer): TopKByScore.Buffer = {
    other.foreach((s, i) => buf.add(s, i))
    buf
  }

  override def eval(buf: TopKByScore.Buffer): Any = {
    val rows = buf.sortedBestFirst.map { case (s, i) =>
      InternalRow(i, s)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKByScore.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) =>
      out.writeDouble(s)
      idType match {
        case LongType => out.writeLong(i.asInstanceOf[Long])
        case IntegerType => out.writeInt(i.asInstanceOf[Int])
        case DoubleType => out.writeDouble(i.asInstanceOf[Double])
        case StringType =>
          val b = i.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var r = 0
    while (r < n) {
      val s = in.readDouble()
      val i: Any = idType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case DoubleType => in.readDouble()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len); in.readFully(b)
          UTF8String.fromBytes(b)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      buf.add(s, i)
      r += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {

  /** Size-k heap, worst survivor on top (so eviction is O(log k)).
    * "Worse" = lower score, or equal score and larger id.
    */
  final class Buffer(k: Int, idType: DataType) {
    private def cmpId(a: Any, b: Any): Int = idType match {
      case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case IntegerType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
      case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    // max of this ordering = the WORST kept pair
    private val worseFirst: Ordering[(Double, Any)] = (x, y) => {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else cmpId(x._2, y._2)
    }
    private val heap = mutable.PriorityQueue.empty[(Double, Any)](worseFirst)

    def size: Int = heap.size

    def add(score: Double, id: Any): Unit = {
      if (heap.size < k) heap.enqueue((score, id))
      else if (worseFirst.compare((score, id), heap.head) < 0) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }

    def foreach(f: (Double, Any) => Unit): Unit =
      heap.foreach(p => f(p._1, p._2))

    /** (score desc, id asc) — rank order. */
    def sortedBestFirst: Seq[(Double, Any)] =
      heap.clone().dequeueAll.reverse.toSeq
  }

  /** Aggregate Column: ordered `array<struct<id, score>>` of the top-k. */
  def apply(score: Column, id: Column, k: Int): Column =
    ExpressionBridge.column(
      TopKByScore(
        ExpressionBridge.expression(score),
        ExpressionBridge.expression(id), k).toAggregateExpression())
}
