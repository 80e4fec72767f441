package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Kernel forms of the per-field output chain.
  *
  * The column formulations — `filter(c, isNotNull)`,
  * `when(size(c) === 0, null).otherwise(c)` — have two costs at a ~30-field
  * output width: higher-order functions evaluate interpreted (per-element
  * lambda plumbing outside codegen), and `when/otherwise` repeats the whole
  * upstream expression tree `c`, which fallback evaluation cannot
  * common-subexpression-eliminate — the complete extract+transform chain of
  * a field can run twice per row. Each kernel evaluates its child exactly
  * once. Equivalence to the column formulations is pinned by a property
  * test (TransformsSpec). */
object ArrayKernels {

  /** compact nils → optional distinct → empty-to-NULL, in one pass
    * (context.rb:117-129 output normalization). */
  case class NormalizeOutputExpression(child: Expression,
                                       keepNils: Boolean,
                                       dedup: Boolean,
                                       emptyToNull: Boolean)
    extends UnaryExpression with KernelCodegen {

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = true
    override def prettyName: String = "normalize_output"

    override def evalChild(childValue: AnyRef): AnyRef = {
      val arr = childValue.asInstanceOf[ArrayData]
      if (arr == null) return null
      val n = arr.numElements()
      val out = new java.util.ArrayList[AnyRef](n)
      val seen = if (dedup) new java.util.HashSet[AnyRef](n * 2) else null
      var i = 0
      while (i < n) {
        val v: AnyRef = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        if (v != null || keepNils) {
          if (seen == null || seen.add(v)) out.add(v)
        }
        i += 1
      }
      if (out.isEmpty && emptyToNull) null
      else new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `first` post-option: keep the head element unless it is null
    * (Array(acc[0]) drops a nil head, marc21.rb:118-124). */
  case class HeadNonNullExpression(child: Expression)
    extends UnaryExpression with KernelCodegen {

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "head_non_null"

    override def evalChild(childValue: AnyRef): AnyRef = {
      val arr = childValue.asInstanceOf[ArrayData]
      if (arr == null || arr.numElements() == 0 || arr.isNullAt(0))
        new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](arr.getUTF8String(0)))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** trim_punctuation over every element of an array column in one kernel
    * call — `transform(c, v => trimPunct(v))` pays interpreted
    * lambda-variable plumbing per element. Null elements stay null. */
  case class ArrayTrimPunctuationExpression(child: Expression)
    extends UnaryExpression with KernelCodegen {

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = true
    override def prettyName: String = "array_trim_punctuation"

    override def evalChild(childValue: AnyRef): AnyRef = {
      val arr = childValue.asInstanceOf[ArrayData]
      if (arr == null) return null
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (arr.isNullAt(i)) null
          else org.apache.spark.unsafe.types.UTF8String.fromString(
            graft.marc.TrimPunctuation(arr.getUTF8String(i).toString))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def arrayTrimPunctuation(c: Column): Column =
    ColumnBridge.column(ArrayTrimPunctuationExpression(ColumnBridge.expression(c)))

  def normalizeOutput(c: Column, keepNils: Boolean, dedup: Boolean,
                      emptyToNull: Boolean): Column =
    ColumnBridge.column(NormalizeOutputExpression(
      ColumnBridge.expression(c), keepNils, dedup, emptyToNull))

  def headNonNull(c: Column): Column =
    ColumnBridge.column(HeadNonNullExpression(ColumnBridge.expression(c)))
}
