package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most `capacity` counters.
  *
  * Update: present → +1; room → insert 1; full → decrement every
  * counter, dropping zeros (the classic frequent-items algorithm).
  * Merge (Agarwal et al., PODS'12): sum counters, then shrink back to
  * capacity by subtracting the (capacity+1)-largest count from all.
  *
  * Deterministic GUARANTEE, not deterministic bits: for stream length N,
  * every estimate is in [true − N/(capacity+1), true], so any item with
  * true frequency > N/(capacity+1) is guaranteed present. The surviving
  * SET below that bar may vary with partition order — this is an
  * approximation primitive (pinned by guarantee-based tests, never an
  * engine-vs-engine hash oracle). */
final class MgSketch(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)
  var processed = 0L

  def add(item: String, by: Long = 1L): Unit = {
    processed += by
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, cur + by); return }
    if (counts.size < capacity) { counts.put(item, by); return }
    // decrement-all by the insertion weight; drop exhausted counters.
    // (weighted MG: inserting weight b decrements everyone by ≤ b and
    // retains any remainder for the new item)
    var dec = by
    val minEntry = java.lang.Long.valueOf(min())
    if (minEntry < dec) dec = minEntry.longValue()
    if (dec > 0) decrementAll(dec)
    val rem = by - dec
    if (rem > 0 && counts.size < capacity) counts.put(item, rem)
  }

  private def min(): Long = {
    var m = Long.MaxValue
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v < m) m = v }
    if (m == Long.MaxValue) 0L else m
  }

  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  def mergeFrom(other: MgSketch): Unit = {
    processed += other.processed
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-largest value, drop non-positives
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1)
      decrementAll(cut)
    }
  }
}

/** `graft_heavy_hitters(item, capacity)` →
  * `array<struct<item string, count long>>` sorted by (count desc, item
  * asc) — one bounded-memory pass + map-side partial aggregation: the
  * shuffle carries one ≤ capacity-entry sketch per task, never the
  * (item, count) universe. Null items are skipped. */
case class HeavyHitters(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch] with ExpectsInputTypes {

  require(capacity > 0, s"capacity must be positive: $capacity")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MgSketch = new MgSketch(capacity)

  override def update(buf: MgSketch, input: InternalRow): MgSketch = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgSketch, other: MgSketch): MgSketch = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgSketch): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  override def serialize(buf: MgSketch): Array[Byte] = {
    var bytes = 0
    val items = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items.add((b, e.getValue)); bytes += 12 + b.length
    }
    val bb = ByteBuffer.allocate(16 + bytes)
    bb.putInt(buf.capacity).putInt(items.size).putLong(buf.processed)
    var i = 0
    while (i < items.size) {
      val (b, c) = items.get(i)
      bb.putInt(b.length).put(b).putLong(c); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgSketch(bb.getInt())
    val n = bb.getInt()
    buf.processed = bb.getLong()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(item = newChildren(0))
}

object HeavyHittersAggregate {
  /** Misra–Gries sketch aggregate over a string column. */
  def heavyHitters(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(item), capacity)
        .toAggregateExpression())
}
