package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact discrete percentile aggregate
  * `graft_percentile_disc(value, num, den)`: the member value at rank
  * k = clamp((num·(n+1)) DIV den, 1, n) in value order — the same exact
  * integer rank convention as [[graft.ops.Percentiles.Target]] and the
  * q24 oracle, so `graft_percentile_disc(v, 1, 2)` is the p50 member,
  * `(v, 99, 100)` the p99 member. NULL values are excluded (SQL
  * percentile semantics); an empty group yields NULL.
  *
  * The buffer is a value→count map merged map-side, so memory is
  * O(DISTINCT values per group), NOT O(rows) — exact and mergeable for
  * discrete domains (status codes, ratings, bucketed latencies), where
  * the shuffle carries one bounded map per task per group. The distinct
  * cap guards that contract loudly: a group exceeding `MaxDistinct`
  * distinct values fails the job with guidance instead of quietly
  * ballooning the shuffle. For continuous high-cardinality values use
  * [[graft.ops.Percentiles.exactDiscrete]] (low-cardinality group keys:
  * bounded multi-scan selection) or a percentile window (high-cardinality
  * group keys: per-group sorts are small exactly when groups are many).
  */
case class PercentileDiscAgg(
    value: Expression,
    num: Int,
    den: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    maxDistinct: Int = PercentileDiscAgg.MaxDistinct)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]]
  with ExpectsInputTypes {

  require(den > 0 && num > 0 && num <= den,
    s"graft_percentile_disc requires 0 < num <= den, got $num/$den")

  override def children: Seq[Expression] = Seq(value)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_percentile_disc"
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  // the cap applies on EVERY insertion path — map-side updates AND each
  // entry a merge folds in — so a group that only exceeds it when
  // per-task maps combine at final merge still fails loudly (pinned by
  // PercentileDiscAggSpec's under-cap-partitions/over-cap-union test)
  private def bump(buf: mutable.HashMap[Double, Long], v: Double, c: Long): Unit = {
    buf.updateWith(v) { prev => Some(prev.getOrElse(0L) + c) }
    require(buf.size <= maxDistinct,
      s"graft_percentile_disc saw more than $maxDistinct " +
        "distinct values in one group — this aggregate is for DISCRETE value " +
        "domains (its buffer is a value->count map). For continuous values " +
        "use Percentiles.exactDiscrete (low-cardinality group keys) or a " +
        "percentile window (high-cardinality group keys).")
  }

  override def update(buf: mutable.HashMap[Double, Long],
                      input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = value.eval(input)
    if (v != null) bump(buf, v.asInstanceOf[Double], 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[Double, Long],
                     other: mutable.HashMap[Double, Long]): mutable.HashMap[Double, Long] = {
    other.foreach { case (v, c) => bump(buf, v, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null
    var n = 0L
    buf.valuesIterator.foreach(n += _)
    val k = math.max(1L, math.min(n, (num.toLong * (n + 1L)) / den.toLong))
    val values = buf.keysIterator.toArray
    java.util.Arrays.sort(values)
    var seen = 0L
    var i = 0
    while (i < values.length) {
      seen += buf(values(i))
      if (seen >= k) return values(i)
      i += 1
    }
    values.last // unreachable (seen == n >= k at the last value)
  }

  override def serialize(buf: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, c) => bb.putDouble(v).putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[Double, Long]
    var i = 0
    while (i < n) { buf.put(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileDiscAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileDiscAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PercentileDiscAgg =
    copy(value = newChildren(0))
}

object PercentileDiscAgg {
  /** Distinct-value cap per group buffer — far above any genuinely
    * discrete domain, far below an accidental continuous one. */
  val MaxDistinct: Int = 1 << 20

  /** `percentileDisc(value, num, den)` aggregate column. */
  def percentileDisc(value: Column, num: Int, den: Int): Column =
    ColumnBridge.column(
      PercentileDiscAgg(ColumnBridge.expression(value), num, den)
        .toAggregateExpression())
}
