package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) with optional web-text cleanup —
  * the ingest-side canonicalization step of a curation pipeline: exact
  * dedup, fingerprinting, and tokenization all assume one byte sequence
  * per canonically-equal string (e.g. `é` composed U+00E9 vs decomposed
  * `e`+U+0301 hash apart without it).
  *
  * Spark has no normalization built-in; a Scala UDF would pay
  * serialization per row. This kernel rides [[KernelCodegen]] inside
  * whole-stage codegen and fast-paths pure-ASCII input (the overwhelming
  * case in web corpora) to a single byte scan with zero allocation —
  * ASCII is already NFC.
  *
  * `stripControls` additionally removes C0/C1 control characters except
  * tab/newline/carriage-return (the ftfy-style cleanup; applied after
  * NFC). Null in → null out.
  */
case class NormalizeTextExpression(child: Expression,
                                   stripControls: Boolean)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "nfc_normalize"

  @inline private def isStrippedControl(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ||
      (c >= 0x7f && c <= 0x9f)

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    // ASCII fast path: NFC-invariant; controls rare — scan once, and
    // only fall into the rewrite when something must change
    val n = utf.numBytes()
    var i = 0
    var ascii = true
    var needsStrip = false
    while (ascii && i < n) {
      val b = utf.getByte(i)
      if (b < 0) ascii = false
      else if (stripControls && isStrippedControl(b.toChar)) needsStrip = true
      i += 1
    }
    if (ascii && !needsStrip) return utf
    val s = utf.toString
    val nfc =
      if (ascii || Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
      else Normalizer.normalize(s, Normalizer.Form.NFC)
    val cleaned =
      if (!stripControls) nfc
      else {
        val sb = new java.lang.StringBuilder(nfc.length)
        var j = 0
        while (j < nfc.length) {
          val c = nfc.charAt(j)
          if (!isStrippedControl(c)) sb.append(c)
          j += 1
        }
        sb.toString
      }
    if (cleaned eq s) utf else UTF8String.fromString(cleaned)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeTextExpression {
  /** NFC-normalize a string column; `stripControls` also drops C0/C1
    * controls except tab/newline/CR. */
  def nfcNormalize(text: Column, stripControls: Boolean = false): Column =
    ColumnBridge.column(NormalizeTextExpression(
      ColumnBridge.expression(text), stripControls))
}
