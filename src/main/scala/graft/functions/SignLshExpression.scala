package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sign-LSH bucket ids for ALL hash tables in one kernel: element t of the
  * result is table t's bucket (bit i = sign(v · plane_{t,i})), so
  * posexplode recovers the table index.
  *
  * The column formulation — numTables × numPlanes chained `when(dot ≥ 0)`
  * sub-expressions — produces a generated method past the JIT's comfort
  * zone (60+ inlined literal-array dot products); this kernel keeps the
  * plane matrix as a plain double[][][] computed once per expression
  * instance and runs one tight loop per row. Bucket values are identical:
  * same seeded hyperplanes, same min-length dot, same `>= 0` sign test. */
case class SignLshBucketsExpression(child: Expression, numPlanes: Int,
                                    numTables: Int, dim: Int, seedBase: Int)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_lsh_buckets"

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(numTables)(t =>
      graft.ops.Similarity.hyperplanes(numPlanes, dim, seed = seedBase + t))

  override def evalChild(childValue: AnyRef): AnyRef = {
    val arr = childValue.asInstanceOf[ArrayData]
    if (arr == null) return null
    val vec = arr.toDoubleArray()
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      val tp = planes(t)
      var bucket = 0L
      var i = 0
      while (i < tp.length) {
        val p = tp(i)
        val n = math.min(vec.length, p.length)
        var s = 0.0
        var j = 0
        while (j < n) { s += vec(j) * p(j); j += 1 }
        if (s >= 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBucketsExpression {
  def signLshBuckets(vec: Column, numPlanes: Int, numTables: Int,
                     dim: Int, seedBase: Int): Column =
    ColumnBridge.column(SignLshBucketsExpression(
      ColumnBridge.expression(vec), numPlanes, numTables, dim, seedBase))
}
