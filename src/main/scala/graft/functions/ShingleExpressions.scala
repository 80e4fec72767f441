package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling and exact set-Jaccard as kernels.
  *
  * The column formulations (`transform(sequence(...), i => array_join(
  * slice(words, i+1, n)))` and `size(array_intersect)/size(array_union)`)
  * run per-row through interpreted higher-order-function plumbing and
  * build several intermediate arrays per document. Each kernel is one pass;
  * semantics are pinned to the column formulations by a property test
  * (OpsSpec). */
case class ShinglesExpression(child: Expression, n: Int)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "shingles"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val text = utf.toString
    // limit -1: Spark's split(str, " ", 0) KEEPS trailing empty tokens
    // (unlike Java's default limit-0 split) — and so does the DuckDB
    // oracle's string_split
    val words = text.split(" ", -1)
    // LinkedHashSet = array_distinct's keep-first-occurrence order
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (words.length < n) out.add(utf)
    else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val m = words.length - n + 1
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| / |A ∪ B| over two string-array columns, set semantics (inputs
  * need not be distinct). Matches `size(array_intersect(a,b)) /
  * size(array_union(a,b))` including both-empty → NaN. */
case class ShingleJaccardExpression(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "shingle_jaccard"

  def compute(aAny: AnyRef, bAny: AnyRef): Double = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[AnyRef]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      setA.add(if (a.isNullAt(i)) null else a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[AnyRef]()
    var inter = 0
    var bOnly = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val v: AnyRef = if (b.isNullAt(i)) null else b.getUTF8String(i)
      if (seenB.add(v)) {
        if (setA.contains(v)) inter += 1 else bOnly += 1
      }
      i += 1
    }
    inter.toDouble / (setA.size + bOnly).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[AnyRef], b.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardExpr", this,
      classOf[ShingleJaccardExpression].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleExpressions {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpression(ColumnBridge.expression(text), n))

  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(ShingleJaccardExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
