package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Similarity.pqTopK):
  *
  *  - [[PqEncodeExpression]]: vector → M byte codes (per-subspace argmin
  *    against a driver-trained codebook literal) — 8·D bytes become M on
  *    disk and in the scan;
  *  - [[PqLutExpression]]: query vector → the M×K table of partial dot
  *    products against every centroid (computed once per query on the
  *    broadcast side);
  *  - [[PqAdcExpression]]: (codes, lut) → approximate dot product via
  *    asymmetric distance computation — M table lookups per corpus row,
  *    no vector arithmetic in the O(n·m) sweep.
  *
  * Subspace m covers dims [m·D/M, (m+1)·D/M) (integer bounds, so D need
  * not divide M evenly). Codebooks are `Array[subspace][centroid][dim]`;
  * codes store the centroid index as a raw byte (read back as `& 0xFF`,
  * so K <= 256).
  */
object PqExpressions {

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpression(ColumnBridge.expression(vec), codebooks))

  def pqLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExpression(ColumnBridge.expression(vec), codebooks))

  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcExpression(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut), ksub))

  private[graft] def subBounds(dim: Int, m: Int): Array[Int] =
    Array.tabulate(m + 1)(i => i * dim / m)
}

case class PqEncodeExpression(child: Expression,
                              codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val arr = childValue.asInstanceOf[ArrayData]
    if (arr == null) return null
    val v = arr.toDoubleArray()
    val m = codebooks.length
    val bounds = PqExpressions.subBounds(v.length, m)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val from = bounds(s)
      val to = math.min(bounds(s + 1), v.length)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var i = from
        while (i < to) { val t = v(i) - c(i - from); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqLutExpression(child: Expression,
                           codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  @transient private lazy val ksub = codebooks.map(_.length).max

  override def evalChild(childValue: AnyRef): AnyRef = {
    val arr = childValue.asInstanceOf[ArrayData]
    if (arr == null) return null
    val v = arr.toDoubleArray()
    val m = codebooks.length
    val bounds = PqExpressions.subBounds(v.length, m)
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val from = bounds(s)
      val to = math.min(bounds(s + 1), v.length)
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var i = from
        while (i < to) { d += v(i) * c(i - from); i += 1 }
        out(s * ksub + j) = d
        j += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC approximate dot: sum of lut[m*ksub + (codes[m] & 0xFF)]. */
case class PqAdcExpression(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  def compute(codesAny: AnyRef, lutAny: AnyRef): Double = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    // indexed ArrayData access, NOT toDoubleArray(): this runs once per
    // (corpus row × query) pair, and materializing the M×K lut (32 KB at
    // M=16, K=256) per pair would turn the sweep into a memcpy benchmark
    // — M getDouble calls touch only the M entries actually needed
    var acc = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      acc += lut.getDouble(m * ksub + (codes.getByte(m) & 0xFF))
      m += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[AnyRef], b.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $b.getDouble($i * $ksub + ($a.getByte($i) & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
