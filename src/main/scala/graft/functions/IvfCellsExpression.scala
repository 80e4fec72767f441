package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `nprobe` nearest IVF cells of a vector, best first: one kernel pass
  * over the centroid matrix instead of nlist inlined struct/dot
  * sub-expressions plus an array_sort per row.
  *
  * Ordering is value-identical to the column formulation it replaces —
  * `reverse(array_sort(array(struct(sim, cell))))`: descending by cosine
  * under Spark's double ordering (NaN greatest, via Double.compare), ties
  * broken by the HIGHER cell index first. */
case class IvfCellsExpression(child: Expression, centroids: Seq[Seq[Double]],
                              nprobe: Int)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cells"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cnorms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  override def evalChild(childValue: AnyRef): AnyRef = {
    val arr = childValue.asInstanceOf[ArrayData]
    if (arr == null) return null
    val vec = arr.toDoubleArray()
    var vs = 0.0
    var j = 0
    while (j < vec.length) { vs += vec(j) * vec(j); j += 1 }
    val vnorm = math.sqrt(vs)

    val k = cents.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(vec.length, cent.length)
      var s = 0.0
      j = 0
      while (j < n) { s += vec(j) * cent(j); j += 1 }
      sims(c) = s / (vnorm * cnorms(c))
      c += 1
    }

    // top-nprobe cells by (sim desc, cell desc) under Double.compare
    val order = Array.tabulate(k)(identity)
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val cmp = java.lang.Double.compare(sims(b), sims(a))
      if (cmp != 0) cmp else Integer.compare(b, a)
    })
    val n = math.min(nprobe, k)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = boxed(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfCellsExpression {
  def ivfCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(IvfCellsExpression(
      ColumnBridge.expression(vec), centroids.map(_.toSeq).toSeq, nprobe))
}
