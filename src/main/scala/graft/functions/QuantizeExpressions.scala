package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization kernel.
  *
  * Semantics are EXACTLY graft.ops.Similarity's higher-order-function
  * formulation (pinned by a parity property test in SimilaritySpec):
  *
  *   m     = array_max(transform(v, abs))           -- NaN greatest, nulls skipped
  *   scale = m / 127.0
  *   q(i)  = when(m = 0, 0) otherwise round(v(i) * 127.0 / m) cast tinyint
  *
  * where `round` is Spark's Round(_, 0): BigDecimal HALF_UP (half away
  * from zero) with NaN/Infinity passed through, and the tinyint cast is
  * `.toByte`.
  *
  * One deliberate divergence: on a NaN/Infinity element the HOF chain
  * THROWS under ANSI mode (CAST_OVERFLOW casting NaN to tinyint) — one
  * bad embedding kills a 100 TB job. This kernel is total: a NaN scaled
  * value quantizes to 0 (and the vector's scale is NaN, flagging it).
  *
  * Why a kernel: the HOF tree is interpreted (no whole-stage codegen, no
  * subexpression elimination), and projection collapse inlines one copy of
  * the FULL tree into every downstream field reference — a query reading
  * scale plus four aggregates of q re-ran abs/max/round per element five
  * times through lambda plumbing. This expression walks the buffer once
  * and stays inside the surrounding generated code via [[KernelCodegen]].
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with KernelCodegen {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("q", ArrayType(ByteType, containsNull = true), nullable = true)))

  override def prettyName: String = "graft_quantize_int8"

  // never null: a null input maps to struct(null, null), like the HOF
  override def nullable: Boolean = false

  override def evalChild(childValue: AnyRef): AnyRef = {
    // null vector -> struct(null, null), matching the HOF oracle: struct()
    // over null-yielding children is a NON-null row of null fields, so the
    // kernel must not collapse it to a null struct (isNull / non-null
    // counts would diverge between the two formulations)
    if (childValue == null) return new GenericInternalRow(Array[Any](null, null))
    val v = childValue.asInstanceOf[ArrayData]
    val n = v.numElements()

    // pass 1: m = max(|v_i|) over non-null elements, NaN ordered greatest
    // (java.lang.Double.compare), exactly array_max's TypeUtils ordering
    var m = 0.0
    var hasMax = false
    var hasNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) { hasNull = true }
      else {
        val a = math.abs(v.getDouble(i))
        if (!hasMax || java.lang.Double.compare(a, m) > 0) { m = a; hasMax = true }
      }
      i += 1
    }

    val scale: AnyRef = if (hasMax) java.lang.Double.valueOf(m / 127.0) else null

    // pass 2: quantize. m == 0 short-circuits to 0 via the `when`; a null
    // m (all-null / empty input) makes every arithmetic result null.
    val q: ArrayData =
      if (!hasMax) {
        new GenericArrayData(new Array[Any](n)) // all nulls (or empty)
      } else if (m == 0.0) {
        UnsafeArrayData.fromPrimitiveArray(new Array[Byte](n))
      } else if (!hasNull) {
        val out = new Array[Byte](n)
        i = 0
        while (i < n) { out(i) = quantize(v.getDouble(i), m); i += 1 }
        UnsafeArrayData.fromPrimitiveArray(out)
      } else {
        val out = new Array[Any](n)
        i = 0
        while (i < n) {
          if (!v.isNullAt(i)) out(i) = java.lang.Byte.valueOf(quantize(v.getDouble(i), m))
          i += 1
        }
        new GenericArrayData(out)
      }
    new GenericInternalRow(Array[Any](scale, q))
  }

  /** round(x*127/m) as Spark's Round(DoubleType, 0), then non-ANSI byte cast. */
  private def quantize(x: Double, m: Double): Byte = {
    val scaled = x * 127.0 / m
    val rounded =
      if (scaled.isNaN || scaled.isInfinite) scaled
      else java.math.BigDecimal.valueOf(scaled)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    rounded.toByte
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** struct(scale double, q array<tinyint>) — one-pass codegen quantizer. */
  def quantize(vec: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(vec)))
}
