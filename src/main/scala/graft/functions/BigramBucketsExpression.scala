package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-bigram bucket keys for the interpolated bigram LM
  * ([[graft.ops.TextAnalysis.lmBigramBitsScore]], query t37): for each
  * adjacent token pair (w[i], w[i+1]) of the space-split text, a 7-hex-char
  * key — the first 3 hex chars of md5(w[i+1]) (the second token's UNIGRAM
  * bucket, 16³ space) followed by the first 4 hex chars of
  * md5(w[i] || ' ' || w[i+1]) (the pair's BIGRAM bucket, 16⁴ space).
  * Downstream splits the key back with substring; packing both buckets in
  * one string keeps the exploded column narrow and the scoring join
  * single-key.
  *
  * One kernel pass per row: the column formulation —
  * `transform(sequence(1, size(toks)-1), i -> struct(substring(md5(
  * element_at(toks,i+1)),1,3), substring(md5(concat_ws(" ",
  * element_at(toks,i), element_at(toks,i+1))),1,4)))` — runs through
  * interpreted higher-order-function plumbing and hashes every token's
  * full hex digest twice per position; here each token's md5 is computed
  * at most once (memo per row), the pair digest consumes token bytes + a
  * separator byte directly, and only the needed hex prefix chars are
  * built. Semantics are pinned to the column formulation by an OpsSpec
  * property test.
  *
  * Tokenization matches `split(text, " ")` (keep empties, NO trim — the
  * t37 grid, different from [[WindowHashesExpression]]'s trimmed grid).
  * Fewer than 2 tokens → empty array; null → null (explode_outer treats
  * both identically downstream). */
case class BigramBucketsExpression(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with KernelCodegen {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_buckets"

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val words = utf.toString.split(" ", -1)
    val m = words.length - 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val bytes = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      bytes(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = digest.get()
    // unigram digests: token i+1's first 2 md5 bytes → 3 hex chars
    // (computed once per token even when it appears in two pairs)
    val space = Array[Byte](' ')
    val out = new Array[AnyRef](m)
    val uniHi = new Array[Byte](words.length) // first digest byte
    val uniLo = new Array[Byte](words.length) // second digest byte
    i = 1
    while (i < words.length) {
      md.reset()
      md.update(bytes(i))
      val d = md.digest()
      uniHi(i) = d(0); uniLo(i) = d(1)
      i += 1
    }
    i = 0
    while (i < m) {
      md.reset()
      md.update(bytes(i))
      md.update(space)
      md.update(bytes(i + 1))
      val d = md.digest()
      val key = new Array[Char](7)
      key(0) = hexChars((uniHi(i + 1) >> 4) & 0xf)
      key(1) = hexChars(uniHi(i + 1) & 0xf)
      key(2) = hexChars((uniLo(i + 1) >> 4) & 0xf)
      key(3) = hexChars((d(0) >> 4) & 0xf)
      key(4) = hexChars(d(0) & 0xf)
      key(5) = hexChars((d(1) >> 4) & 0xf)
      key(6) = hexChars((d(1) & 0xf))
      out(i) = UTF8String.fromString(new String(key))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramBucketsExpression {
  def bigramBuckets(text: Column): Column =
    ColumnBridge.column(BigramBucketsExpression(ColumnBridge.expression(text)))
}
