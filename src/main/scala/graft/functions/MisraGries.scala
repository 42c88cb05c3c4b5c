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

/** Misra–Gries heavy-hitter sketch as a native mergeable Catalyst
  * aggregate: a bounded map of `capacity` counters over BIGINT item keys.
  * The partial-aggregate exchange carries at most `capacity` (item, count)
  * pairs per map task — a fixed-size summary of an unbounded stream, which
  * is the 100 TB answer to "which keys dominate" when an exact groupBy of
  * the full key set would be the biggest shuffle in the job.
  *
  * Guarantees (the reason a sketch can feed an EXACT query):
  *  - any item with true count > n / (capacity + 1) is present in the
  *    final sketch, for any partition split and any merge order;
  *  - each surviving counter underestimates by at most n / (capacity + 1).
  * Merging follows Agarwal et al., "Mergeable Summaries" (PODS'12):
  * counters add; if more than `capacity` survive, the (capacity+1)-largest
  * count is subtracted from all and non-positive counters drop — the same
  * error bound telescopes through arbitrary merge trees.
  *
  * The estimates themselves are merge-order-dependent (only the bounds are
  * not), so oracle-gated queries must use the sketch for CANDIDATES only
  * and re-derive exact counts in a verification pass — see
  * `text_heavy_hitters` for the two-pass shape.
  */
case class MisraGries(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(capacity > 0, "capacity must be positive")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      if (buf.contains(key)) buf(key) += 1L
      else if (buf.size < capacity) buf(key) = 1L
      else {
        // classic MG step: a full sketch meeting a new item decrements
        // every counter instead of inserting (the new item's single
        // occurrence cancels against one occurrence of each survivor)
        val dead = buf.iterator.collect { case (k, c) if c <= 1L => k }.toArray
        buf.mapValuesInPlace((_, c) => c - 1L)
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-largest count from everything; at most
      // `capacity` strictly-larger counters can survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1))
      val dead = buf.iterator.collect { case (k, c) if c <= cut => k }.toArray
      buf.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    // deterministic emission order (est desc, item asc); the VALUES are
    // still merge-order-dependent — see the class doc
    val rows = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(rows.map { case (k, c) => InternalRow(k, c) })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeLong(k); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf(in.readLong()) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(off: Int): MisraGries =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MisraGries =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren.head)
}

object MisraGries {
  /** Column API: `heavy_hitters(item, capacity)` — item BIGINT. */
  def apply(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), capacity)
        .toAggregateExpression())
}
