package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio (compressed bytes / raw bytes) — the
  * entropy-proxy quality signal from the web-corpus filtering literature:
  * machine-generated or template-stamped text compresses far below
  * human prose, so a low ratio flags boilerplate/spam that n-gram
  * repetition measures miss (long-range repeats). High ratios (~1) flag
  * random/binary soup.
  *
  * A per-row Deflater ride inside codegen via [[KernelCodegen]]; the
  * deflater is reused per thread (end()/reset() churn dominates
  * otherwise). Ratios are for FILTERING (relative comparisons on one
  * cluster image), not for cross-engine oracles — zlib output length is
  * implementation-versioned, so this signal is golden-tested, never
  * hash-compared against another engine. Null → null; empty → 1.0. */
case class CompressionRatioExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "compression_ratio"

  @transient private lazy val local =
    new ThreadLocal[Deflater] {
      override def initialValue(): Deflater =
        new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    }
  @transient private lazy val buf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
    }

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val raw = utf.getBytes
    if (raw.length == 0) return java.lang.Double.valueOf(1.0)
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var total = 0L
    val b = buf.get()
    while (!d.finished()) total += d.deflate(b)
    java.lang.Double.valueOf(total.toDouble / raw.length)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatioExpression {
  def compressionRatio(text: Column): Column =
    ColumnBridge.column(CompressionRatioExpression(
      ColumnBridge.expression(text)))
}
