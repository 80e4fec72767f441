package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the encoding-fix step (ftfy's core case) a web
  * corpus needs before any byte-level dedup or tokenization: text that
  * was UTF-8 on the wire but got DECODED AS Windows-1252/Latin-1
  * somewhere upstream ("cafÃ©", "â€™") hashes, shingles, and tokenizes
  * as garbage, and every such document duplicates its correctly-decoded
  * twin without matching it.
  *
  * PINNED rule (deterministic, conservative — a repair must never fire
  * on legitimately-accented text):
  *  1. Fast path: a string with no char ≥ U+0080 is returned as-is.
  *  2. Re-encode the string to bytes via the Windows-1252 map (ASCII
  *     verbatim; U+0080-U+009F's cp1252 display characters — €‚ƒ„…†‡
  *     ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ — to 0x80-0x9F; U+00A0-U+00FF to their
  *     Latin-1 byte). ANY char outside that map means the string
  *     cannot be a cp1252 misdecode → return as-is.
  *  3. Strictly decode those bytes as UTF-8 (overlongs, surrogates,
  *     > U+10FFFF, truncated sequences all reject). Valid AND at least
  *     one multi-byte sequence → return the decoded string (ONE repair
  *     pass — double-mojibake stays single-repaired, pinned); anything
  *     else → return as-is.
  *  Null in → null out; total on garbage.
  *
  * The conservatism is the point: "café" re-encodes to the single byte
  * 0xE9, which is not valid UTF-8, so correctly-decoded accented text
  * NEVER rewrites (spec-pinned); only byte sequences that round-trip
  * as real multi-byte UTF-8 — overwhelming evidence of a misdecode —
  * repair. Single-pass char/byte scan inside whole-stage codegen. */
case class MojibakeExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fix_mojibake"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    UTF8String.fromString(MojibakeExpression.fix(utf.toString))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MojibakeExpression {

  /** fix_mojibake(text) per the pinned rules above. */
  def fixMojibake(text: Column): Column =
    ColumnBridge.column(MojibakeExpression(ColumnBridge.expression(text)))

  /** cp1252 bytes 0x80-0x9F → the characters they display as (0 =
    * undefined byte). Source: the Windows-1252 code page, public. */
  private val cp1252High: Array[Char] = Array(
    '\u20AC', '\u0000', '\u201A', '\u0192',
    '\u201E', '\u2026', '\u2020', '\u2021',
    '\u02C6', '\u2030', '\u0160', '\u2039',
    '\u0152', '\u0000', '\u017D', '\u0000',
    '\u0000', '\u2018', '\u2019', '\u201C',
    '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A',
    '\u0153', '\u0000', '\u017E', '\u0178')

  /** char → cp1252 byte (0x80-0x9F range), or -1. */
  private val cp1252Rev: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    var b = 0
    while (b < 32) {
      if (cp1252High(b) != '\u0000') m.put(cp1252High(b), 0x80 + b)
      b += 1
    }
    m
  }

  def fix(s: String): String = {
    // 1. fast path
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s

    // 2. re-encode as cp1252; bail on any unmappable char
    val bytes = new Array[Int](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c < 0x80) c.toInt
        else if (c >= 0xA0 && c <= 0xFF) c.toInt
        else {
          val hit = cp1252Rev.get(c)
          if (hit != null) hit.intValue
          // raw C1 control (U+0080-U+009F): the LATIN-1 misdecode of
          // the same byte (cp1252 leaves 5 bytes undefined; Latin-1
          // passes them through as controls)
          else if (c <= 0x9F) c.toInt
          else return s
        }
      bytes(i) = b
      i += 1
    }

    // 3. strict UTF-8 decode; require >= 1 multi-byte sequence
    val out = new java.lang.StringBuilder(s.length)
    var sawMulti = false
    i = 0
    while (i < bytes.length) {
      val b0 = bytes(i)
      if (b0 < 0x80) { out.append(b0.toChar); i += 1 }
      else {
        val (len, min) =
          if (b0 >= 0xC2 && b0 <= 0xDF) (2, 0x80)
          else if (b0 >= 0xE0 && b0 <= 0xEF) (3, 0x800)
          else if (b0 >= 0xF0 && b0 <= 0xF4) (4, 0x10000)
          else return s // 0x80-0xC1 lead, 0xF5+: never valid UTF-8
        if (i + len > bytes.length) return s // truncated
        var cp = b0 & (0x7F >> len)
        var k = 1
        while (k < len) {
          val bk = bytes(i + k)
          if (bk < 0x80 || bk > 0xBF) return s // bad continuation
          cp = (cp << 6) | (bk & 0x3F)
          k += 1
        }
        if (cp < min || cp > 0x10FFFF ||
          (cp >= 0xD800 && cp <= 0xDFFF)) return s
        out.append(Character.toChars(cp))
        sawMulti = true
        i += len
      }
    }
    if (sawMulti) out.toString else s
  }
}
