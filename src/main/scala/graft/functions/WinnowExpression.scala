package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as a codegen kernel: k-gram rolling hashes over the
  * whitespace-normalized lowercase text, minimum per sliding window,
  * DISTINCT minima sorted ascending — array<long>, null → null.
  *
  * Bit-compatible with [[graft.ops.TextAnalysis.winnow]] by
  * construction — both call `winnowCore` (base-31 polynomial over
  * Z/2^64, O(1) rolling update). The guarantee that matters downstream:
  * EQUAL normalized texts produce EQUAL fingerprint sets (overlap
  * exactly 1.0), and a local edit disturbs only the windows covering
  * it. */
case class WinnowExpression(child: Expression, k: Int, window: Int)
  extends UnaryExpression with KernelCodegen {

  require(k > 0 && window > 0, s"k and window must be positive: $k, $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    new GenericArrayData(
      graft.ops.TextAnalysis.winnowCore(utf.toString, k, window))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  def winnowCol(text: Column, k: Int = 5, window: Int = 4): Column =
    ColumnBridge.column(WinnowExpression(ColumnBridge.expression(text), k,
      window))
}
