package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (the Gopher/RedPajama-class
  * "compressibility" filter): `deflate(text).length / text.bytes` —
  * boilerplate, repeated spans, and template spam compress far below
  * natural prose (~0.3-0.6 for English text; <0.2 is machine-generated
  * repetition; ~1.0 is random bytes / encrypted junk). Complements t04's
  * exact line-repetition and t27's type-token ratio: deflate sees
  * APPROXIMATE and long-range redundancy neither catches.
  *
  * PINNED: java.util.zip.Deflater, BEST_COMPRESSION level, raw deflate
  * (nowrap=true — no zlib header so tiny inputs aren't dominated by
  * framing), ratio = compressedBytes / utf8Bytes as double; empty text →
  * 1.0 (nothing to compress, nothing saved); null → null. Deflate at a
  * fixed level is deterministic for a given input, so the value is
  * partition- and platform-stable (same zlib algorithm, pure-Java
  * implementation in the JDK).
  *
  * Scale shape: per-row JVM kernel inside whole-stage codegen; one
  * Deflater per evaluation (allocation-bound, still >100 MB/s/core —
  * scan-class cost at 100 TB).
  */
case class DeflateRatioExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects string, got ${child.dataType.simpleString}")

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    java.lang.Double.valueOf(DeflateRatioExpression.ratio(utf.getBytes))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatioExpression {

  def deflateRatio(text: Column): Column =
    ColumnBridge.column(DeflateRatioExpression(ColumnBridge.expression(text)))

  def ratio(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_COMPRESSION, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}
