package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over long keys — the
  * broadcast-sketch primitive behind scale-path decontamination: a
  * might-contain prefilter answers "definitely clean" for the vast
  * majority of corpus rows WITHOUT any join or shuffle, and only the
  * maybe-contaminated remainder pays the exact verification join. No
  * false negatives by construction; false positives are bounded by the
  * builder's fpp and removed by the exact tail.
  *
  * The filter rides the expression as a serialized reference object
  * (the broadcast-centroid pattern of IvfCellsExpression): one copy per
  * task closure, probed via a JVM call inside whole-stage codegen.
  * Null in → false (a null key is a member of nothing), keeping the
  * result primitive-boolean for codegen. */
case class BloomMightContainExpression(child: Expression,
                                       bytes: Array[Byte])
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def evalChild(childValue: AnyRef): AnyRef = {
    if (childValue == null) return java.lang.Boolean.FALSE
    java.lang.Boolean.valueOf(
      bloom.mightContainLong(childValue.asInstanceOf[java.lang.Long]))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpression {
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** might-contain probe of a LONG column against a serialized filter. */
  def mightContain(key: Column, bytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContainExpression(
      ColumnBridge.expression(key), bytes))
}
