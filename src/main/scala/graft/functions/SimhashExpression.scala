package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
