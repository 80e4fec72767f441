package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
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

/** HTML → MAIN-CONTENT text — the boilerplate-removal step above
  * [[HtmlTextExpression]]: tag stripping keeps navigation menus, link
  * farms, and footers verbatim; a web corpus wants the body copy only
  * (the readability/boilerpipe step, here as pinned deterministic
  * rules rather than a trained classifier).
  *
  * PINNED semantics, layered on the t41 rules (script/style/comment
  * drop, quoted-attr tag scan, entity/NCR decode, whitespace collapse):
  *  1. The document is segmented into BLOCKS at the same block-tag
  *     boundaries t41 turns into line breaks; each block's text follows
  *     the t41 text rules.
  *  2. CONTAINER drop: text inside `<nav> <header> <footer> <aside>
  *     <form>` elements (open/close tracked per tag name with a
  *     floor-zero depth counter; a tag with a TOP-LEVEL trailing `/`
  *     is self-closing and changes no depth — a solidus inside an
  *     unquoted attribute value is value text, the HTML5 rule) is
  *     boilerplate regardless of content.
  *  3. DENSITY drop: a surviving block is kept iff it has at least
  *     `minWords` whitespace-separated words AND its link density —
  *     non-space chars emitted inside `<a>` elements (same depth
  *     tracking; anchors are BLOCK-LOCAL — a block boundary closes any
  *     open anchor, so an unclosed `<a>` poisons at most one block) —
  *     over all non-space chars is at most `maxLinkDensity`. Short
  *     fragments (headings, buttons, "read more") and link lists
  *     (menus, tag clouds, related-article boxes) fail these gates;
  *     body paragraphs pass.
  *  4. Kept blocks join with a single `\n`, in document order.
  *  Null in → null out; any byte garbage in → total (never throws).
  *
  * Same execution shape as t41: a single-pass char scan inside
  * whole-stage codegen, CPU-bound in the scan stage, shuffles nothing.
  */
case class HtmlMainTextExpression(child: Expression,
                                  minWords: Int = 5,
                                  maxLinkDensity: Double = 0.33)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_main_text"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    UTF8String.fromString(
      HtmlTextExpression.extractMain(utf.toString, minWords, maxLinkDensity))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** HTML → outlink list — the web-GRAPH construction step: every crawl
  * quality pipeline wants the (page, href, anchor-text) edges that feed
  * link-graph signals (PageRank/HITS over registered domains, anchor
  * text as retrieval/labeling signal, frontier discovery). Output:
  * `array<struct<url:string, anchor:string>>` in document order.
  *
  * PINNED semantics (same scan machinery as the t41/t44 kernels):
  *  1. A link is an `<a ...>` open tag carrying an `href` attribute
  *     (attr name case-insensitive; value quoted `'…'`/`"…"` or
  *     unquoted to the next whitespace or `>`; character references in
  *     the value decode — `&amp;` is routine in real hrefs). `<a>`
  *     without href starts no link; a self-closing `<a href=x />`
  *     (top-level trailing solidus — a `/` inside an unquoted value,
  *     as in `href=http://x.com/`, is value text per the HTML5 rule)
  *     yields an empty-anchor link.
  *  2. Anchor text = text between the open tag and the matching
  *     `</a>`, t41 text rules (entities decode, whitespace collapses,
  *     block boundaries inside the anchor contribute one space);
  *     nested `<a>` (invalid HTML) closes the pending link first; an
  *     unterminated link closes at end of input.
  *  3. Links inside script/style/comments do not exist.
  *  Null in → null out; any byte garbage in → total. Raw hrefs are
  *  returned VERBATIM (no base resolution / canonicalization — chain
  *  [[UrlExpressions.resolveUrl]] and canonical_url explicitly). */
case class HtmlLinksExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "html_links"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val links = HtmlTextExpression.links(utf.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      links.map { case (u, a) =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(u), UTF8String.fromString(a))
      }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlTextExpression {

  /** html_to_text(html): plain text per the pinned semantics above. */
  def htmlToText(html: Column): Column =
    ColumnBridge.column(HtmlTextExpression(ColumnBridge.expression(html)))

  /** html_links(html): (url, anchor) outlinks per
    * [[HtmlLinksExpression]]'s pinned semantics. */
  def htmlLinks(html: Column): Column =
    ColumnBridge.column(HtmlLinksExpression(ColumnBridge.expression(html)))

  /** html_main_text(html): main-content text per the pinned
    * boilerplate-removal semantics on [[HtmlMainTextExpression]]. */
  def htmlMainText(html: Column, minWords: Int = 5,
                   maxLinkDensity: Double = 0.33): Column =
    ColumnBridge.column(HtmlMainTextExpression(
      ColumnBridge.expression(html), minWords, maxLinkDensity))

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

  private val containerTags: Array[String] =
    Array("nav", "header", "footer", "aside", "form")

  /** Parse the tag-content region [from, to) (between the tag name and
    * the closing `>`): (first entity-decoded `href` value or null,
    * selfClosing). `selfClosing` is true only for a TOP-LEVEL trailing
    * `/` — a solidus consumed as part of an unquoted attribute value
    * (`href=http://x.com/`) is value text, NOT a tag closer, matching
    * the HTML5 tokenizer's attribute-value states. The shared attribute
    * walk for the links/main-content kernels (one drift-prone copy,
    * not three). */
  private[graft] def parseTag(s: String, from: Int, to: Int): (String, Boolean) = {
    var i = from
    var href: String = null
    var selfClosing = false
    while (i < to) {
      selfClosing = false
      while (i < to && (s.charAt(i) <= ' ' || s.charAt(i) == '/')) {
        if (s.charAt(i) == '/') selfClosing = true
        i += 1
      }
      if (i >= to) return (href, selfClosing)
      selfClosing = false
      val n0 = i
      while (i < to && {
        val c = s.charAt(i); c > ' ' && c != '=' && c != '/'
      }) i += 1
      val name = s.substring(n0, i).toLowerCase(java.util.Locale.ROOT)
      while (i < to && s.charAt(i) <= ' ') i += 1
      var value: String = null
      if (i < to && s.charAt(i) == '=') {
        i += 1
        while (i < to && s.charAt(i) <= ' ') i += 1
        if (i < to && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i); i += 1
          val v0 = i
          while (i < to && s.charAt(i) != q) i += 1
          value = s.substring(v0, i)
          if (i < to) i += 1
        } else {
          // unquoted: runs to whitespace or '>' — '/' is value text
          val v0 = i
          while (i < to && s.charAt(i) > ' ') i += 1
          value = s.substring(v0, i)
        }
      }
      if (name == "href" && value != null && href == null)
        href = decodeEntities(value)
      if (name.isEmpty) i += 1 // never stall on pathological input
    }
    (href, selfClosing)
  }

  private def decodeEntities(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '&') {
        val (d, n) = decodeEntity(v, i)
        sb.append(if (d == null) "&" else d)
        i = n
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** The outlink kernel (driver-callable for tests) — see
    * [[HtmlLinksExpression]] for the pinned semantics. */
  def links(s: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var pendingUrl: String = null
    val anchor = new java.lang.StringBuilder(64)
    var pendingSpace = false
    def finishLink(): Unit = if (pendingUrl != null) {
      out += ((pendingUrl, anchor.toString))
      pendingUrl = null; anchor.setLength(0); pendingSpace = false
    }
    @inline def emitChar(c: Char): Unit = if (pendingUrl != null) {
      if (c <= ' ') pendingSpace = true
      else {
        if (anchor.length > 0 && pendingSpace) anchor.append(' ')
        pendingSpace = false
        anchor.append(c)
      }
    }
    @inline def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) { emitChar(str.charAt(k)); k += 1 }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
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
          i = if (afterClose >= s.length) s.length
          else tagEnd(s, afterClose - close.length)
        } else if (i + 1 < s.length && {
          val n = s.charAt(i + 1)
          isAsciiLetter(n) || n == '/' || n == '!' || n == '?'
        }) {
          var p = i + 1
          val closing = s.charAt(p) == '/'
          if (closing) p += 1
          val name0 = p
          while (p < s.length && (isAsciiLetter(s.charAt(p)) ||
            (s.charAt(p) >= '0' && s.charAt(p) <= '9'))) p += 1
          val name = s.substring(name0, p).toLowerCase(java.util.Locale.ROOT)
          val end = tagEnd(s, i)
          if (name == "a") {
            finishLink() // </a> ends it; a nested <a> ends it first too
            if (!closing) {
              val (href, selfClosing) = parseTag(s, p, math.max(p, end - 1))
              if (href != null) {
                if (selfClosing) out += ((href, ""))
                else pendingUrl = href
              }
            }
          } else if (blockTags.contains(name) && anchor.length > 0)
            pendingSpace = true // block boundary inside an anchor = one space
          i = end
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
    finishLink()
    out.toSeq
  }

  /** The main-content kernel (driver-callable for tests) — see
    * [[HtmlMainTextExpression]] for the pinned semantics. */
  def extractMain(s: String, minWords: Int, maxLinkDensity: Double): String = {
    val kept = new java.lang.StringBuilder(s.length min 1 << 16)
    // current-block accumulators
    val out = new java.lang.StringBuilder(256)
    var pendingSpace = false
    var visChars = 0   // non-space chars in the block
    var linkChars = 0  // non-space chars emitted inside <a>
    var words = 0
    val containerDepth = new Array[Int](containerTags.length)
    var anchorDepth = 0
    @inline def inContainer: Boolean = {
      var k = 0
      while (k < containerDepth.length) {
        if (containerDepth(k) > 0) return true
        k += 1
      }
      false
    }
    def finalizeBlock(): Unit = {
      if (out.length > 0) {
        val keep = !inContainer && words >= minWords &&
          linkChars.toDouble <= maxLinkDensity * visChars
        if (keep) {
          if (kept.length > 0) kept.append('\n')
          kept.append(out)
        }
      }
      out.setLength(0)
      pendingSpace = false; visChars = 0; linkChars = 0; words = 0
    }
    @inline def emitChar(c: Char): Unit =
      if (c <= ' ') pendingSpace = true
      else {
        if (out.length == 0) words = 1
        else if (pendingSpace) { out.append(' '); words += 1 }
        pendingSpace = false
        out.append(c)
        visChars += 1
        if (anchorDepth > 0) linkChars += 1
      }
    @inline def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) { emitChar(str.charAt(k)); k += 1 }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
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
          var p = i + 1
          val closing = s.charAt(p) == '/'
          if (closing) p += 1
          val name0 = p
          while (p < s.length && (isAsciiLetter(s.charAt(p)) ||
            (s.charAt(p) >= '0' && s.charAt(p) <= '9'))) p += 1
          val name = s.substring(name0, p).toLowerCase(java.util.Locale.ROOT)
          val end = tagEnd(s, i)
          if (blockTags.contains(name)) {
            finalizeBlock()
            // anchors are inline and block-LOCAL: a block boundary ends
            // any open anchor, so one unclosed <a> (routine tag soup —
            // this kernel does not auto-close like a browser) poisons
            // at most its own block's link density, never the document
            anchorDepth = 0
          }
          val ci = containerTags.indexOf(name)
          if (ci >= 0 || name == "a") {
            // `<x/>`: top-level trailing solidus only — a '/' inside an
            // unquoted attribute value (href=http://x.com/) is value
            // text, not a tag closer (shared parseTag walk)
            val selfClosing = !closing &&
              parseTag(s, p, math.max(p, end - 1))._2
            if (!selfClosing) {
              if (ci >= 0) {
                if (closing) {
                  if (containerDepth(ci) > 0) containerDepth(ci) -= 1
                } else containerDepth(ci) += 1
              } else {
                if (closing) { if (anchorDepth > 0) anchorDepth -= 1 }
                else anchorDepth += 1
              }
            }
          }
          i = end
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
    finalizeBlock()
    kept.toString
  }
}
