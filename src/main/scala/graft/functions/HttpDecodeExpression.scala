package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP-payload charset decode — the step between a WARC `response`
  * record's raw body bytes and text any downstream operator (mojibake
  * repair, NFC, shingling, gates) can consume. A real crawl declares
  * its encoding in three inconsistent places; the sniff order is the
  * browser one (WHATWG encoding standard, simplified to the
  * deterministic core):
  *
  *  1. a byte-order mark wins outright: EF BB BF → UTF-8,
  *     FE FF → UTF-16BE, FF FE → UTF-16LE (the BOM is consumed);
  *  2. else `charset=` parameter of the HTTP `Content-Type` header
  *     (case-insensitive, optional quotes);
  *  3. else an HTML `<meta charset=X>` / `<meta http-equiv=
  *     "Content-Type" content="...; charset=X">` within the first
  *     1024 payload bytes, scanned byte-wise ASCII-case-insensitively
  *     (the prescan window browsers use);
  *  4. else UTF-8.
  *
  * Label normalization follows the WHATWG table's most consequential
  * row: `iso-8859-1` / `latin1` / `us-ascii` decode as windows-1252
  * (servers that say Latin-1 serve cp1252; the superset decode is
  * byte-for-byte identical on the honest range). Unknown or
  * JVM-unsupported labels fall back to UTF-8. Malformed sequences
  * decode with U+FFFD replacement, never an exception — crawl bytes
  * are hostile by default. Null payload → null; null content-type →
  * sniff steps 1/3/4 only.
  *
  * Single-pass kernel inside whole-stage codegen (strict-codegen
  * clean); the scan never allocates beyond the decoder itself. */
case class HttpDecodeExpression(left: Expression, right: Expression)
  extends BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "http_decode_text"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"http_decode_text expects (binary, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def evalChildren(payload: AnyRef, contentType: AnyRef): AnyRef = {
    if (payload == null) return null
    val bytes = payload.asInstanceOf[Array[Byte]]
    val ct = if (contentType == null) null else contentType.toString
    UTF8String.fromString(HttpDecodeExpression.decode(bytes, ct))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HttpDecodeExpression {

  def decodeHttpText(payload: Column, contentType: Column): Column =
    ColumnBridge.column(HttpDecodeExpression(
      ColumnBridge.expression(payload), ColumnBridge.expression(contentType)))

  private val MetaPrescanBytes = 1024

  private[graft] def decode(bytes: Array[Byte], contentType: String): String = {
    // 1. BOM
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return decodeWith(bytes, 3, StandardCharsets.UTF_8)
    if (bytes.length >= 2) {
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      if (b0 == 0xfe && b1 == 0xff)
        return decodeWith(bytes, 2, StandardCharsets.UTF_16BE)
      if (b0 == 0xff && b1 == 0xfe)
        return decodeWith(bytes, 2, StandardCharsets.UTF_16LE)
    }
    // 2. Content-Type charset parameter
    var cs = if (contentType == null) null else charsetParam(contentType)
    // 3. meta prescan
    if (cs == null) cs = metaCharset(bytes)
    decodeWith(bytes, 0, resolve(cs))
  }

  /** `charset=` parameter value from a MIME type string, or null. All
    * scanning AND slicing happen on the case-folded copy: charset
    * labels are case-insensitive anyway, and indexing the ORIGINAL with
    * lower-derived offsets would shift on length-changing case folds
    * (e.g. U+0130 lowercases to two chars) — crawl headers are hostile. */
  private[graft] def charsetParam(ct: String): String = {
    val lower = ct.toLowerCase(java.util.Locale.ROOT)
    val ix = lower.indexOf("charset=")
    if (ix < 0) return null
    val s = ix + "charset=".length
    var e = s
    while (e < lower.length && lower.charAt(e) != ';' &&
      lower.charAt(e) != ' ' && lower.charAt(e) != '\t') e += 1
    var v = lower.substring(s, e).trim
    if (v.length >= 2 && (v.charAt(0) == '"' || v.charAt(0) == '\'') &&
        v.charAt(v.length - 1) == v.charAt(0))
      v = v.substring(1, v.length - 1)
    if (v.isEmpty) null else v
  }

  /** Scan the first 1024 bytes for `<meta ... charset=X>` (either the
    * HTML5 attribute or the http-equiv content parameter — both reduce
    * to a `charset=` byte pattern INSIDE a `<meta` tag; a bare
    * `charset=` in page text, a URL, or a script must NOT trigger —
    * the scan is scoped to the tag's `<meta`..`>` extent). ASCII-case-
    * insensitive, byte-wise: multi-byte encodings the prescan cannot
    * read declare themselves via BOM instead (step 1). */
  private[graft] def metaCharset(bytes: Array[Byte]): String = {
    val end = math.min(bytes.length, MetaPrescanBytes)
    val tag = "<meta"
    var i = 0
    while (i < end - tag.length) {
      var j = 0
      while (j < tag.length && lowerAscii(bytes(i + j)) == tag.charAt(j)) j += 1
      // a name BOUNDARY must follow: '<metadata>' (inline SVG) is not
      // a meta tag and must not be scanned for charset=
      val boundary = j == tag.length && i + tag.length < end && {
        val b = bytes(i + tag.length)
        b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '/' || b == '>'
      }
      if (boundary) {
        var tagEnd = i + tag.length
        while (tagEnd < end && bytes(tagEnd) != '>') tagEnd += 1
        // a tag that never closes inside the prescan window is CLIPPED:
        // any charset value in it could be truncated mid-label (e.g.
        // iso-8859-15 reading as iso-8859-1) — ignore it, UTF-8 default
        if (tagEnd < end) {
          val cs = charsetIn(bytes, i + tag.length, tagEnd)
          if (cs != null) return cs
          i = tagEnd
        } else return null
      }
      i += 1
    }
    null
  }

  /** `charset=VALUE` within `[from, until)`, or null. */
  private def charsetIn(bytes: Array[Byte], from: Int, until: Int): String = {
    val pat = "charset="
    var i = from
    while (i <= until - pat.length) {
      var j = 0
      while (j < pat.length && lowerAscii(bytes(i + j)) == pat.charAt(j)) j += 1
      if (j == pat.length) {
        var s = i + pat.length
        // optional quote
        var quote = 0
        if (s < until && (bytes(s) == '"' || bytes(s) == '\'')) {
          quote = bytes(s); s += 1
        }
        var e = s
        while (e < until && {
          val b = bytes(e)
          if (quote != 0) b != quote
          else b != '"' && b != '\'' && b != '>' && b != ' ' &&
            b != ';' && b != '/' && b != '\t' && b != '\r' && b != '\n'
        }) e += 1
        // a quote that never closes before the tag ends is malformed
        if (quote != 0 && e == until) return null
        if (e > s)
          return new String(bytes, s, e - s, StandardCharsets.US_ASCII).trim
        return null
      }
      i += 1
    }
    null
  }

  private def lowerAscii(b: Byte): Char = {
    val c = (b & 0xff).toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  /** WHATWG-style label → JVM charset; unknown → UTF-8. */
  private[graft] def resolve(label: String): Charset = {
    if (label == null) return StandardCharsets.UTF_8
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    l match {
      case "" => StandardCharsets.UTF_8
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => StandardCharsets.UTF_8
      // the WHATWG superset rule: Latin-1 labels decode as cp1252
      case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "l1" |
           "us-ascii" | "ascii" | "windows-1252" | "cp1252" | "x-cp1252" =>
        Charset.forName("windows-1252")
      case other =>
        try { if (Charset.isSupported(other)) Charset.forName(other)
              else StandardCharsets.UTF_8 }
        catch { case _: java.nio.charset.IllegalCharsetNameException =>
          StandardCharsets.UTF_8 }
    }
  }

  private def decodeWith(bytes: Array[Byte], off: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off)).toString
  }
}
