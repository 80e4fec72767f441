package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.marc.TrimPunctuation

/** `trim_punctuation(value)` as a scalar expression over the shared
  * char-scan kernel (marc21.rb:252-271; equivalence to the original regex
  * formulation pinned by TrimPunctuationTest). */
case class TrimPunctuationExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "trim_punctuation"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val s = childValue.asInstanceOf[UTF8String]
    if (s == null) null
    else UTF8String.fromString(TrimPunctuation(s.toString))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrimPunctuationExpression {
  def trimPunct(value: Column): Column =
    ColumnBridge.column(TrimPunctuationExpression(ColumnBridge.expression(value)))
}
