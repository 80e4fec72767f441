package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Pins that KernelCodegen expressions COMPILE under codegen for every
  * result-type shape — primitive (double, boolean) and reference (array).
  *
  * GenerateMutableProjection.generate compiles the generated Java
  * directly: a janino error THROWS here, whereas inside
  * WholeStageCodegenExec it silently falls back to interpreted execution
  * for the whole stage (the round-9 find: `(double) Object` casts made
  * every primitive-returning kernel — PQ-free paths like
  * compression_ratio and bloom_might_contain — run interpreted without
  * failing a single test). */
class KernelCodegenSpec extends AnyFunSuite {

  private def str(s: String): AnyRef =
    if (s == null) null else UTF8String.fromString(s)

  test("double-returning nullable kernel compiles and evaluates under codegen") {
    val expr = CompressionRatioExpression(
      BoundReference(0, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(str("abcabcabcabcabcabcabcabc")))
    assert(!out.isNullAt(0))
    val ratio = out.getDouble(0)
    assert(ratio > 0.0 && ratio < 1.5, s"implausible deflate ratio $ratio")
    // null in -> null out through the generated path
    assert(proj(InternalRow(null)).isNullAt(0))
    // empty -> 1.0 (documented contract)
    assert(proj(InternalRow(str(""))).getDouble(0) == 1.0)
  }

  test("boolean-returning non-nullable kernel compiles and evaluates under codegen") {
    val bloom = BloomFilter.create(100)
    bloom.putLong(42L)
    val bytes = BloomMightContainExpression.serialize(bloom)
    val expr = BloomMightContainExpression(
      BoundReference(0, LongType, nullable = true), bytes)
    val proj = GenerateMutableProjection.generate(Seq(expr))
    assert(proj(InternalRow(java.lang.Long.valueOf(42L))).getBoolean(0))
    assert(!proj(InternalRow(java.lang.Long.valueOf(7L))).getBoolean(0))
    // null key is a member of nothing (stays non-null false)
    val nullRow = proj(InternalRow(null))
    assert(!nullRow.isNullAt(0) && !nullRow.getBoolean(0))
  }

  test("array-returning kernel still compiles and evaluates under codegen") {
    val expr = ShinglesExpression(
      BoundReference(0, StringType, nullable = true), n = 2)
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(str("a b c")))
    val arr = out.getArray(0)
    assert(arr.numElements() == 2)
    assert(arr.getUTF8String(0).toString == "a b")
    assert(arr.getUTF8String(1).toString == "b c")
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("jaccard binary kernel compiles under codegen") {
    def arr(xs: String*): AnyRef =
      new GenericArrayData(xs.map(str).toArray)
    val expr = ShingleJaccardExpression(
      BoundReference(0, ArrayType(StringType), nullable = true),
      BoundReference(1, ArrayType(StringType), nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(arr("x", "y"), arr("y", "z")))
    assert(out.getDouble(0) == 1.0 / 3.0)
  }
}
