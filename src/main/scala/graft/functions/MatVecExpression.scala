package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** y = M·x − offset in one kernel pass over the broadcast matrix — the
  * projection step of PCA/whitening ([[graft.ops.Projection]]). One
  * traversal of the input vector per output component, no per-component
  * sub-expression trees, no re-reading the child (the IvfCellsExpression
  * pattern). Rows shorter than the matrix width treat missing dims as 0;
  * a null input stays null. */
case class MatVecExpression(child: Expression, mat: Seq[Seq[Double]],
                            offset: Seq[Double])
  extends UnaryExpression with KernelCodegen {

  require(mat.nonEmpty && mat.length == offset.length,
    s"matrix rows (${mat.length}) must match offset length (${offset.length})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec"

  @transient private lazy val rows: Array[Array[Double]] =
    mat.map(_.toArray).toArray
  @transient private lazy val off: Array[Double] = offset.toArray

  override def evalChild(childValue: AnyRef): AnyRef = {
    val arr = childValue.asInstanceOf[ArrayData]
    if (arr == null) return null
    val vec = arr.toDoubleArray()
    val out = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val n = math.min(vec.length, r.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += r(j) * vec(j); j += 1 }
      out(i) = s - off(i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecExpression {
  def matVec(vec: Column, mat: Array[Array[Double]],
             offset: Array[Double]): Column =
    ColumnBridge.column(MatVecExpression(
      ColumnBridge.expression(vec), mat.map(_.toSeq).toSeq, offset.toSeq))
}
