package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → plain text extraction — the FIRST step of every web-scale
  * curation pipeline (raw crawl HTML precedes the clean `text` column
  * all downstream gates assume; the C4/trafilatura step the engine
  * lacked). Reference analogue: the markup-stripping half of the
  * reference's generic-XML path (`nokogiri_reader.rb:61-125`,
  * `nokogiri_macros.rb:13-46` — `to_text` over parsed nodes); this
  * kernel is the streaming equivalent for tag-soup HTML, where a strict
  * XML parse would reject half the web.
  *
  * PINNED semantics (deterministic, and reproducible by an independent
  * SQL oracle over planted markup):
  *  1. `<script>…</script>`, `<style>…</style>` (case-insensitive,
  *     attributes allowed) and `<!-- … -->` comments are dropped whole,
  *     content included; unterminated ones drop to end of input.
  *  2. Other `<…>` markup is removed. A tag is a `<` followed by an
  *     ASCII letter, `/`, `!` or `?`, consumed through the next `>`
  *     (quoted attributes are honored: a `>` inside `'…'`/`"…"` does
  *     not close the tag); an unterminated tag drops to end of input.
  *     Any other `<` is literal text.
  *  3. BLOCK-level tags (open or close: p div br hr li ul ol dl dt dd
  *     h1–h6 table tr td th caption blockquote pre article section
  *     header footer nav aside main form fieldset figure figcaption
  *     address title) emit one line break; consecutive block
  *     boundaries collapse to ONE `\n`. Inline tags (b i a span em …)
  *     emit nothing — they never split a word.
  *  4. Character references decode: `&amp; &lt; &gt; &quot; &apos;
  *     &nbsp;` (nbsp → plain space) and numeric `&#NN;` / `&#xHH;`
  *     (code points ≤ 0x10FFFF; surrogate/overflow → literal).
  *     Unrecognized references stay literal.
  *  5. Whitespace: runs of ASCII whitespace (anything ≤ 0x20) in text
  *     collapse to a single space; lines carry no leading/trailing
  *     spaces; the result has no leading/trailing whitespace.
  *  Null in → null out; any byte garbage in → total (never throws).
  *
  * A tight single-pass char scan (no DOM, no regex) riding
  * [[KernelCodegen]] inside whole-stage codegen — at 100 TB the decode
  * is CPU-bound in the scan stage and shuffles nothing.
  */
case class HtmlTextExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_to_text"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    UTF8String.fromString(HtmlTextExpression.extract(utf.toString))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlTextExpression {

  /** html_to_text(html): plain text per the pinned semantics above. */
  def htmlToText(html: Column): Column =
    ColumnBridge.column(HtmlTextExpression(ColumnBridge.expression(html)))

  private val blockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "tr", "td", "th", "caption", "blockquote", "pre",
    "article", "section", "header", "footer", "nav", "aside", "main",
    "form", "fieldset", "figure", "figcaption", "address", "title")

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** True iff s[i..] starts (case-insensitively) with `what`. */
  private def startsWithIgnoreCase(s: String, i: Int, what: String): Boolean = {
    if (i + what.length > s.length) return false
    var k = 0
    while (k < what.length) {
      if (lower(s.charAt(i + k)) != what.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Index just past the closing `>` of the tag starting at `lt`
    * (s(lt) == '<'), honoring quoted attribute values; s.length if
    * unterminated. */
  private def tagEnd(s: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    s.length
  }

  /** Index just past `close` (case-insensitive) searching from `from`;
    * s.length if absent. */
  private def skipPast(s: String, from: Int, close: String): Int = {
    var i = from
    while (i <= s.length - close.length) {
      if (startsWithIgnoreCase(s, i, close)) return i + close.length
      i += 1
    }
    s.length
  }

  private val named: Array[(String, String)] = Array(
    "amp;" -> "&", "lt;" -> "<", "gt;" -> ">",
    "quot;" -> "\"", "apos;" -> "'", "nbsp;" -> " ")

  /** Decode the character reference starting at `amp` (s(amp) == '&').
    * Returns (decoded-or-null, next-index); null decoded = leave the
    * `&` literal and advance by one. */
  private def decodeEntity(s: String, amp: Int): (String, Int) = {
    for ((name, repl) <- named)
      if (startsWithIgnoreCase(s, amp + 1, name))
        return (repl, amp + 1 + name.length)
    if (amp + 1 < s.length && s.charAt(amp + 1) == '#') {
      var i = amp + 2
      var hex = false
      if (i < s.length && (s.charAt(i) == 'x' || s.charAt(i) == 'X')) {
        hex = true; i += 1
      }
      var cp = 0L
      val digits0 = i
      while (i < s.length && cp <= 0x10FFFFL && {
        val c = s.charAt(i)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true } else false
      }) i += 1
      if (i > digits0 && i < s.length && s.charAt(i) == ';' &&
          cp > 0 && cp <= 0x10FFFFL &&
          !(cp >= 0xD800L && cp <= 0xDFFFL))
        return (new String(Character.toChars(cp.toInt)), i + 1)
    }
    (null, amp + 1)
  }

  /** The extraction kernel (driver-callable for tests). */
  def extract(s: String): String = {
    val out = new java.lang.StringBuilder(s.length min 1 << 16)
    var pendingBreak = false // a block boundary was seen since last text
    var pendingSpace = false // whitespace was seen since last text
    @inline def emitChar(c: Char): Unit =
      if (c <= ' ') pendingSpace = true
      else {
        if (out.length > 0) {
          if (pendingBreak) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingBreak = false; pendingSpace = false
        out.append(c)
      }
    @inline def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) { emitChar(str.charAt(k)); k += 1 }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        // a raw-text element's name must END after "script"/"style"
        // (whitespace, '>', or '/') — `<scripty>` is an ordinary tag
        @inline def rawTextOpen(what: String): Boolean =
          startsWithIgnoreCase(s, i, what) && {
            val after = i + what.length
            after >= s.length || s.charAt(after) <= ' ' ||
              s.charAt(after) == '>' || s.charAt(after) == '/'
          }
        if (startsWithIgnoreCase(s, i, "<!--"))
          i = skipPast(s, i + 4, "-->")
        else if (rawTextOpen("<script") || rawTextOpen("<style")) {
          val close = if (lower(s.charAt(i + 2)) == 'c') "</script" else "</style"
          val afterOpen = tagEnd(s, i)
          val afterClose = skipPast(s, afterOpen, close)
          i = if (afterClose >= s.length) s.length else tagEnd(s, afterClose - close.length)
        } else if (i + 1 < s.length && {
          val n = s.charAt(i + 1)
          isAsciiLetter(n) || n == '/' || n == '!' || n == '?'
        }) {
          // tag name for the block test: letters after '<' or '</'
          var p = i + 1
          if (s.charAt(p) == '/') p += 1
          val name0 = p
          while (p < s.length && (isAsciiLetter(s.charAt(p)) ||
            (s.charAt(p) >= '0' && s.charAt(p) <= '9'))) p += 1
          val name = s.substring(name0, p).toLowerCase(java.util.Locale.ROOT)
          if (blockTags.contains(name)) { pendingBreak = true; pendingSpace = false }
          i = tagEnd(s, i)
        } else {
          emitChar('<'); i += 1
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(s, i)
        if (decoded == null) emitChar('&') else emit(decoded)
        i = next
      } else {
        emitChar(c)
        i += 1
      }
    }
    out.toString
  }
}
