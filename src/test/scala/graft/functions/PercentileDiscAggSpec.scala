package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distinct-value cap contract of graft_percentile_disc at the
  * buffer level: the guard must fire on EVERY path that grows a buffer —
  * in particular at merge time, where per-task maps that are each under
  * the cap combine into one that is not. A cap that only checked
  * map-side updates would let the merged buffer balloon silently. */
class PercentileDiscAggSpec extends AnyFunSuite {

  private def agg(maxDistinct: Int) = PercentileDiscAgg(
    BoundReference(0, DoubleType, nullable = true), 1, 2,
    maxDistinct = maxDistinct)

  private def bufOf(a: PercentileDiscAgg, vs: Double*) = {
    val b = a.createAggregationBuffer()
    vs.foreach(v => a.update(b, InternalRow(v)))
    b
  }

  test("partitions under the cap whose union exceeds it fail loudly at merge") {
    val a = agg(maxDistinct = 4)
    val left = bufOf(a, 1.0, 2.0, 3.0)   // 3 distinct: fine map-side
    val right = bufOf(a, 4.0, 5.0, 6.0)  // 3 distinct: fine map-side
    val e = intercept[IllegalArgumentException] { a.merge(left, right) }
    assert(e.getMessage.contains("distinct values"),
      s"merge-side overflow must carry the guidance message: ${e.getMessage}")
  }

  test("map-side overflow fails loudly too") {
    val a = agg(maxDistinct = 4)
    val e = intercept[IllegalArgumentException] {
      bufOf(a, 1.0, 2.0, 3.0, 4.0, 5.0)
    }
    assert(e.getMessage.contains("distinct values"))
  }

  test("an at-cap merge still evaluates to the exact rank member") {
    val a = agg(maxDistinct = 4)
    // counts: 1.0×3, 2.0×1, 3.0×1, 4.0×1 → n=6, p50 rank k=(1*(6+1))/2=3
    val left = bufOf(a, 1.0, 1.0, 2.0)
    val right = bufOf(a, 1.0, 3.0, 4.0)
    val merged = a.merge(left, right)
    assert(merged.size == 4)
    assert(a.eval(merged) == 1.0)
  }

  test("serialize/deserialize round-trips counts exactly") {
    val a = agg(maxDistinct = 100)
    val b = bufOf(a, 1.5, 1.5, -2.25, 7.0)
    val back = a.deserialize(a.serialize(b))
    assert(back == b)
  }
}
