package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-count sketch — the cardinality member of the
  * sketch family next to Misra–Gries frequency (t29) and the quantile
  * summary (t36), with the same EXACT-WHEN-SMALL contract:
  *
  *  - SPARSE mode stores the distinct raw 64-bit hashes exactly (a
  *    sorted-on-serialize open set) while their number fits `2^p`; the
  *    estimate is the set size — exact, partition-invariant,
  *    SQL-oracle-checkable against COUNT(DISTINCT) (modulo 64-bit hash
  *    collisions, negligible below ~2^30 distinct values).
  *  - On overflow it DENSIFIES to 2^p one-byte HyperLogLog registers
  *    (Flajolet et al. 2007, the 64-bit variant of Heule et al.'s
  *    HLL++ without the sparse encoding tricks): register = max rank of
  *    leading zeros per hash-prefix bucket. Register maxima are
  *    order-independent, so dense estimates are merge-order-invariant
  *    too — deterministic, just not exact (standard error ≈ 1.04/√m,
  *    ~1.6% at p=12, pinned by DistinctSketchSpec).
  *
  * Memory: ≤ 16·2^p bytes sparse at peak (open table, load ≤ 1/2,
  * grown geometrically from 16 slots so small groups cost bytes),
  * exactly 2^p bytes dense — bounded task state at any corpus size, the
  * 100 TB shape (a COUNT(DISTINCT) over a high-cardinality column
  * shuffles every distinct value; this shuffles ≤ one register page per
  * task).
  *
  * The hash is the first 8 bytes (big-endian) of md5 of the value's
  * UTF-8 bytes — engine-portable and documented, like the md5-prefix
  * bucketing the samplers use. Nulls are skipped. */
final class DcSketch(val p: Int) {
  val m: Int = 1 << p
  // sparse: open-addressed hash set of raw hashes (0 slot sentinel via
  // `hasZero`), capacity 2^p distinct entries. Starts at 16 slots and
  // grows geometrically (load factor <= 1/2, final size 2*2^p) so a
  // single-element group costs bytes, not 16*2^p — ObjectHashAggregate
  // holds many group buffers per task
  var sparse: Array[Long] = new Array[Long](16)
  var sparseN: Int = 0
  var hasZero: Boolean = false
  var regs: Array[Byte] = null // dense registers once densified

  def dense: Boolean = regs != null

  private def grow(): Unit = {
    val old = sparse
    sparse = new Array[Long](old.length * 2)
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) slotInsert(old(i))
      i += 1
    }
  }

  private def slotInsert(h: Long): Boolean = {
    val mask = sparse.length - 1
    var i = (java.lang.Long.hashCode(h * 0x9e3779b97f4a7c15L)) & mask
    while (sparse(i) != 0L) {
      if (sparse(i) == h) return false
      i = (i + 1) & mask
    }
    sparse(i) = h
    true
  }

  private def sparseAdd(h: Long): Unit = {
    if (h == 0L) {
      if (!hasZero) { hasZero = true; sparseN += 1 }
      return
    }
    if (slotInsert(h)) {
      sparseN += 1
      val nonZero = sparseN - (if (hasZero) 1 else 0)
      if (nonZero * 2 > sparse.length && sparse.length < m * 2) grow()
    }
  }

  private def regUpdate(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(w) + 1).min(64 - p + 1)
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
  }

  private def densify(): Unit = {
    regs = new Array[Byte](m)
    if (hasZero) regUpdate(0L)
    var i = 0
    while (i < sparse.length) {
      if (sparse(i) != 0L) regUpdate(sparse(i))
      i += 1
    }
    sparse = null
  }

  def add(h: Long): Unit =
    if (dense) regUpdate(h)
    else {
      sparseAdd(h)
      if (sparseN > m) densify()
    }

  def mergeFrom(other: DcSketch): Unit = {
    require(other.p == p, s"precision mismatch: $p vs ${other.p}")
    if (other.dense) {
      if (!dense) densify()
      var i = 0
      while (i < m) {
        if ((other.regs(i) & 0xff) > (regs(i) & 0xff)) regs(i) = other.regs(i)
        i += 1
      }
    } else {
      if (other.hasZero) add(0L)
      var i = 0
      while (i < other.sparse.length) {
        if (other.sparse(i) != 0L) add(other.sparse(i))
        i += 1
      }
    }
  }

  /** Exact set size while sparse; HLL estimate (with the standard
    * linear-counting small-range correction) once densified. Rounding
    * is floor(x + 0.5) on a merge-order-invariant double — the result
    * is deterministic either way. */
  def estimate(): Long =
    if (!dense) sparseN.toLong
    else {
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        val r = regs(i) & 0xff
        invSum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r
        if (r == 0) zeros += 1
        i += 1
      }
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / m)
      }
      val e = alpha * m.toDouble * m.toDouble / invSum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else e
      math.floor(corrected + 0.5).toLong
    }
}

object DcSketch {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes of the UTF-8 value, big-endian. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ByteBuffer.wrap(d, 0, 8).getLong
  }
}

/** `graft_distinct_sketch(value, p)` → approximate distinct count
  * (LongType); EXACT while the number of distinct values fits 2^p (the
  * t29/t36 exact-regime contract — size the precision to the expected
  * cardinality when an oracle-checkable answer matters). */
case class DistinctSketch(
    value: Expression,
    precision: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DcSketch] with ExpectsInputTypes {

  require(precision >= 4 && precision <= 18,
    s"precision must be in [4, 18]: $precision (2^p registers of driver " +
      "and task state; 18 is already 256 KiB per group)")

  override def children: Seq[Expression] = Seq(value)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_distinct_sketch"
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): DcSketch = new DcSketch(precision)

  override def update(buf: DcSketch, input: InternalRow): DcSketch = {
    val v = value.eval(input)
    if (v != null) buf.add(DcSketch.hash(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(buf: DcSketch, other: DcSketch): DcSketch = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: DcSketch): Any = buf.estimate()

  override def serialize(buf: DcSketch): Array[Byte] =
    if (buf.dense) {
      val bb = ByteBuffer.allocate(1 + 4 + buf.m)
      bb.put(1.toByte).putInt(buf.p).put(buf.regs)
      bb.array()
    } else {
      // canonical bytes: hashes sorted, so equal SETS serialize equal
      // regardless of insertion/probe history (cheap — <= 2^p longs)
      val bb = ByteBuffer.allocate(1 + 4 + 1 + 4 + 8 * buf.sparseN)
      bb.put(0.toByte).putInt(buf.p)
      bb.put(if (buf.hasZero) 1.toByte else 0.toByte)
      val nonZero = buf.sparse.filter(_ != 0L).sorted
      bb.putInt(nonZero.length)
      nonZero.foreach(bb.putLong)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): DcSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val isDense = bb.get() == 1.toByte
    val buf = new DcSketch(bb.getInt())
    if (isDense) {
      buf.regs = new Array[Byte](buf.m)
      bb.get(buf.regs)
      buf.sparse = null
    } else {
      if (bb.get() == 1.toByte) buf.add(0L)
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.add(bb.getLong()); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}

object DistinctSketchAggregate {
  def distinctSketch(value: Column, precision: Int = 12): Column =
    ColumnBridge.column(
      DistinctSketch(ColumnBridge.expression(value), precision)
        .toAggregateExpression())
}
