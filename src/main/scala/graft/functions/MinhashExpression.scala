package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Banded MinHash signature of a text column: element i is the hash of band
  * i's rowsPerBand minhash values (the LSH bucket key, band index = array
  * position). One tight kernel — shingling, shingle hashing, the
  * (a·h+b) mod 2^61-1 family, and band hashing — with the hash-family
  * parameters computed once per expression instance instead of per row,
  * and a primitive int[] result instead of an encoded Seq of tuples.
  *
  * Value-identical to Dedup.minhashSignature over Dedup.shingles (pinned by
  * OpsSpec): duplicate shingles cannot change a min, so the distinct-set
  * step is skipped. */
case class MinhashBandsExpression(child: Expression, bands: Int, rowsPerBand: Int,
                                  shingleN: Int, seed: Int)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // null text → null (the UDF contract)
  override def prettyName: String = "minhash_bands"

  @transient private lazy val numHashes = bands * rowsPerBand
  @transient private lazy val (paramsA, paramsB) = {
    val ps = graft.ops.Dedup.hashParamsFor(numHashes, seed)
    (ps.map(_._1), ps.map(_._2))
  }

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val text = utf.toString
    val words = text.split(" ")

    // shingle hashes (multiset — duplicates cannot change a min)
    val m = if (words.length < shingleN) 1 else words.length - shingleN + 1
    val hashes = new Array[Long](m)
    if (words.length < shingleN) {
      hashes(0) = MurmurHash3.stringHash(text).toLong & 0xffffffffL
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < shingleN) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        hashes(i) = MurmurHash3.stringHash(sb.toString).toLong & 0xffffffffL
        i += 1
      }
    }

    val sig = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val a = paramsA(k)
      val b = paramsB(k)
      var min = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = graft.ops.Dedup.mulAddModP(a, hashes(i), b)
        if (v < min) min = v
        i += 1
      }
      sig(k) = min
      k += 1
    }

    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      out(b) = MurmurHash3.arrayHash(
        java.util.Arrays.copyOfRange(sig, b * rowsPerBand, (b + 1) * rowsPerBand))
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBandsExpression {
  def minhashBands(text: Column, bands: Int, rowsPerBand: Int,
                   shingleN: Int, seed: Int = 42): Column =
    ColumnBridge.column(MinhashBandsExpression(
      ColumnBridge.expression(text), bands, rowsPerBand, shingleN, seed))
}
