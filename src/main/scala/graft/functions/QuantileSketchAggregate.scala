package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-memory mergeable quantile summary (MRL-style deterministic
  * collapse): at most `capacity` weighted values.
  *
  * Update appends weight-1 values; on overflow the buffer sorts by value
  * and collapses adjacent pairs into one survivor carrying both weights
  * (survivor parity alternates per pair to de-bias the direction).
  * Merge concatenates and re-collapses. All choices are deterministic —
  * there is no random coin — but the RESULT still depends on when
  * collapses happen and therefore on partition order: like the
  * Misra–Gries sketch (t29) this is an approximation primitive, pinned
  * by guarantee tests, EXCEPT in exact mode.
  *
  * EXACT-MODE CONTRACT (the [[MgSketch]] discipline): while total
  * input count ≤ capacity no collapse ever happens, in update OR merge,
  * so the sketch holds every value at weight 1 and
  * [[QSketch.quantile]] is the exact discrete percentile — engine-
  * portable, partition-invariant, SQL-oracle-checkable (t36).
  *
  * Collapsed-mode accuracy (measured, pinned in QuantileSketchSpec):
  * rank error stays within ~2·log₂(n/capacity)·n/capacity on weight-1
  * streams and shrinks as capacity grows — the single-buffer scheme
  * trades the leveled structure's tighter constant for trivially
  * serializable state; raise capacity for tighter answers, or use
  * [[graft.ops.Percentiles.exactDiscrete]] when exactness is required
  * at corpus scale. */
final class QSketch(val capacity: Int) {
  var vs: Array[Double] = new Array[Double](capacity + 1)
  var ws: Array[Long] = new Array[Long](capacity + 1)
  var size: Int = 0
  var processed: Long = 0L
  var collapsed: Boolean = false

  def add(v: Double, w: Long = 1L): Unit = {
    processed += w
    vs(size) = v; ws(size) = w; size += 1
    if (size > capacity) collapse()
  }

  private def sortByValue(): Unit = {
    val idx = Array.tabulate(size)(identity)
      .sortBy(i => (vs(i), ws(i)))
    val nv = new Array[Double](vs.length)
    val nw = new Array[Long](ws.length)
    var i = 0
    while (i < size) { nv(i) = vs(idx(i)); nw(i) = ws(idx(i)); i += 1 }
    vs = nv; ws = nw
  }

  /** Sort by value; merge adjacent EQUAL-WEIGHT pairs first (the MRL
    * level discipline — merging equal weights keeps rank displacement
    * at one half-pair per level instead of compounding), survivor
    * parity alternating per merged pair to de-bias the direction. Only
    * if a pass finds no equal-weight neighbors (pathologically mixed
    * weights) does it fall back to unconditional pairing, which always
    * terminates the shrink loop. */
  private def collapse(): Unit = {
    collapsed = true
    while (size > capacity) {
      sortByValue()
      val before = size
      size = collapsePass(equalOnly = true)
      if (size == before) size = collapsePass(equalOnly = false)
    }
  }

  private def collapsePass(equalOnly: Boolean): Int = {
    var out = 0
    var i = 0
    var merged = 0
    while (i < size) {
      if (i + 1 < size && (!equalOnly || ws(i) == ws(i + 1))) {
        val keepLeft = (merged % 2) == 0
        vs(out) = if (keepLeft) vs(i) else vs(i + 1)
        ws(out) = ws(i) + ws(i + 1)
        merged += 1
        i += 2
      } else {
        vs(out) = vs(i); ws(out) = ws(i); i += 1
      }
      out += 1
    }
    out
  }

  def mergeFrom(other: QSketch): Unit = {
    processed += other.processed
    collapsed ||= other.collapsed
    var i = 0
    while (i < other.size) {
      vs(size) = other.vs(i); ws(size) = other.ws(i); size += 1
      if (size > capacity) collapse()
      i += 1
    }
  }

  /** Sorted (value, weight) pairs. */
  def entries(): Array[(Double, Long)] = {
    sortByValue()
    Array.tabulate(size)(i => (vs(i), ws(i)))
  }

  /** Discrete quantile at num/den: the smallest value whose cumulative
    * weight reaches rank clamp((num·(N+1)) DIV den, 1, N) — the
    * [[graft.ops.Percentiles]] rank convention, exact in exact mode. */
  def quantile(num: Long, den: Long): Double = {
    require(size > 0, "quantile of an empty sketch")
    require(den > 0, s"graft_sketch_quantile: denominator must be > 0: $den")
    require(num >= 0, s"graft_sketch_quantile: numerator must be >= 0: $num")
    sortByValue()
    val n = processed
    val k = math.min(math.max(num * (n + 1) / den, 1L), n)
    var cum = 0L
    var i = 0
    while (i < size) {
      cum += ws(i)
      if (cum >= k) return vs(i)
      i += 1
    }
    vs(size - 1)
  }
}

object QSketch {
  /** Static entry for generated code ([[SketchQuantileExpression]]). */
  def quantileOf(sketch: ArrayData, num: Long, den: Long): Double = {
    val n = sketch.numElements()
    require(n > 0, "graft_sketch_quantile: empty sketch")
    val q = new QSketch(n)
    var i = 0
    while (i < n) {
      val row = sketch.getStruct(i, 2)
      q.add(row.getDouble(0), row.getLong(1))
      i += 1
    }
    q.quantile(num, den)
  }
}

/** `graft_quantile_sketch(value, capacity)` →
  * `array<struct<v double, w long>>` sorted by value — one bounded
  * mergeable summary per group, the shuffle carrying ≤ capacity entries
  * per task (the t29 shape for quantiles: windowed latency percentiles
  * in streams, per-group quantiles at 100 TB without a sort). Null
  * values are skipped; NaNs sort last (IEEE-compare order). */
case class QuantileSketch(
    value: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] with ExpectsInputTypes {

  require(capacity > 0, s"capacity must be positive: $capacity")

  override def children: Seq[Expression] = Seq(value)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_sketch"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): QSketch = new QSketch(capacity)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QSketch, other: QSketch): QSketch = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: QSketch): Any =
    new GenericArrayData(
      buf.entries().map { case (v, w) => InternalRow(v, w) })

  override def serialize(buf: QSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 8 + 1 + 16 * buf.size)
    bb.putInt(buf.capacity).putInt(buf.size).putLong(buf.processed)
    bb.put(if (buf.collapsed) 1.toByte else 0.toByte)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.vs(i)).putLong(buf.ws(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QSketch(bb.getInt())
    val n = bb.getInt()
    buf.processed = bb.getLong()
    buf.collapsed = bb.get() == 1.toByte
    var i = 0
    while (i < n) {
      buf.vs(i) = bb.getDouble(); buf.ws(i) = bb.getLong(); i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}

/** `graft_sketch_merge(sketch, capacity)` — SECOND-ORDER aggregate:
  * folds pre-built `graft_quantile_sketch` summaries (array<struct<v,w>>
  * values, e.g. stored per-day partials) into one summary. This is what
  * makes the sketch's mergeability real at the SQL surface: a 100 TB
  * pipeline aggregates each day once, stores the ≤capacity-entry
  * summary, and rolls weeks/months up from the stored partials without
  * touching raw data again. Exact-when-fits composes: merging
  * never-collapsed sketches whose TOTAL weight count fits `capacity`
  * yields the exact summary (t40's oracle contract). Null sketches are
  * skipped; entry order inside an input sketch is irrelevant. */
case class QuantileSketchMerge(
    sketch: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] with ExpectsInputTypes {

  require(capacity > 0, s"capacity must be positive: $capacity")

  override def children: Seq[Expression] = Seq(sketch)
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sketch_merge"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): QSketch = new QSketch(capacity)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = sketch.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        // ExpectsInputTypes does not enforce containsNull=false, so a
        // user-built array can still carry null entries — skip them
        // instead of NPE-ing in the executor
        if (!arr.isNullAt(i)) {
          val row = arr.getStruct(i, 2)
          buf.add(row.getDouble(0), row.getLong(1))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: QSketch, other: QSketch): QSketch = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: QSketch): Any =
    new GenericArrayData(
      buf.entries().map { case (v, w) => InternalRow(v, w) })

  // serialization shared with QuantileSketch via a carrier instance
  private val codec = QuantileSketch(sketch, capacity)
  override def serialize(buf: QSketch): Array[Byte] = codec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch = codec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))
}

/** `graft_sketch_quantile(sketch, num, den)` → the sketch's discrete
  * quantile at num/den (the q24/q35 rank convention). Exact whenever the
  * sketch never collapsed. */
case class SketchQuantileExpression(first: Expression, second: Expression,
                                    third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false),
    LongType, LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sketch_quantile"

  override def nullSafeEval(s: Any, n: Any, d: Any): Any =
    QSketch.quantileOf(s.asInstanceOf[ArrayData],
      n.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n, d) =>
      s"${ev.value} = graft.functions.QSketch.quantileOf($s, $n, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object QuantileSketchAggregate {
  def quantileSketch(value: Column, capacity: Int): Column =
    ColumnBridge.column(
      QuantileSketch(ColumnBridge.expression(value), capacity)
        .toAggregateExpression())

  def sketchQuantile(sketch: Column, num: Long, den: Long): Column =
    ColumnBridge.column(SketchQuantileExpression(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(num),
      org.apache.spark.sql.catalyst.expressions.Literal(den)))
}
