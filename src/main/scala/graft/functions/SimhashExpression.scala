package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column — the codegen form of
  * [[graft.ops.Dedup.simhash]] (value-identical, property-pinned by
  * OpsSpec). Replaces the last hot-path Scala UDF in the dedup family:
  * the kernel stays a JVM method, but input flows to it straight from the
  * scan inside whole-stage codegen instead of via an encoder round-trip,
  * and null text yields null instead of an NPE.
  */
case class SimhashExpression(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(text: AnyRef): Long =
    graft.ops.Dedup.simhash(text.asInstanceOf[UTF8String].toString)

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimhashExpression].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpression {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimhashExpression(ColumnBridge.expression(text)))
}

/** 64-bit SimHash over byte n-gram windows of a BINARY column — content
  * near-dup for opaque multimodal payloads (image/audio byte streams,
  * where text shingling has no meaning): byte-identical payloads hash
  * identically, payloads differing in a localized byte patch differ in
  * only the windows covering the patch, so their signatures stay within
  * a small hamming distance. Value-identical to the driver reference
  * [[graft.ops.Dedup.binarySimhash]] (property-pinned). Null → null. */
case class BinarySimhashExpression(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= 8,
    s"window bytes must be in [1, 8]: $n (windows pack into one long)")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "binary_simhash64"

  def compute(payload: AnyRef): Long =
    graft.ops.Dedup.binarySimhash(payload.asInstanceOf[Array[Byte]], n)

  override def nullSafeEval(p: Any): Any = compute(p.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("binSimhashExpr", this,
      classOf[BinarySimhashExpression].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $ref.compute($p);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinarySimhashExpression {
  def binarySimhash64(payload: Column, n: Int = 4): Column =
    ColumnBridge.column(
      BinarySimhashExpression(ColumnBridge.expression(payload), n))
}
