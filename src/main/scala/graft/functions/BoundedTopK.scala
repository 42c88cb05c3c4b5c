package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native Catalyst aggregate
  * (`TypedImperativeAggregate`): each partial buffer is a k-bounded heap,
  * so the shuffle carries AT MOST k (score, id) pairs per group per map
  * task — the scale answer to "top-k per group" that a rank window can't
  * give (a window must shuffle and SORT every row of every group; see
  * `win_rank_orders` for that shape).
  *
  * Ranking is total and deterministic: score descending, id ascending on
  * ties. `eval` emits the heap sorted best-first as ARRAY<STRUCT<score,
  * id>>; callers posexplode it into ranked rows. Buffers serialize to a
  * compact length-prefixed binary layout for the partial-aggregate
  * exchange.
  *
  * This is the third native-Catalyst extension axis in the engine, next to
  * codegen'd scalar expressions ([[DotProduct]], [[RollingHash]]) and the
  * typed Aggregator UDAF ([[WeightedAvg]]).
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  /** Dequeue order = WORST first (lowest score, then largest id), so a
    * bounded heap keeps exactly the top-k under (score desc, id asc).
    */
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { t =>
      buf.enqueue(t)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(
      buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "bounded_top_k"

  override def withNewMutableAggBufferOffset(off: Int): BoundedTopK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BoundedTopK =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object BoundedTopK {
  /** Column API: `bounded_top_k(score, id, k)` — score DOUBLE, id BIGINT. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}
