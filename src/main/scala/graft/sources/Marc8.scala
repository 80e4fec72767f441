package graft.sources

import java.text.Normalizer

/** MARC-8 → UTF-8 transcoder, built from the public Library of Congress
  * MARC-8 code tables (ANSEL / Basic Latin and the escape-sequence charset
  * model). Behavioral contract mirrors the reference's `MARC::Reader` use
  * with `invalid: :replace` + MARC-8 external encoding
  * (/root/reference/lib/traject/marc_reader.rb:27-35,
  * test/marc_reader_test.rb:40-64):
  *
  *  - ASCII G0 + ANSEL G1 fully mapped (the dominant legacy-Latin case);
  *  - MARC-8 combining diacritics PRECEDE their base letter — they are
  *    buffered and re-emitted after the base, then the result is NFC
  *    normalized ("globaliza" + cedilla + "c" → "globalizaç");
  *  - numeric character references `&#xXXXX;` expand to their code point
  *    (lossless round trip for characters outside MARC-8);
  *  - escape sequences switch G0/G1 charsets; Greek-symbol, superscript
  *    and subscript sets are mapped; Cyrillic/Greek/Hebrew/Arabic sets are
  *    consumed in correct alignment with each code point replaced by
  *    U+FFFD (documented coverage limit); EACC multibyte consumes 3 bytes
  *    per character;
  *  - any unmapped byte becomes U+FFFD (`invalid: :replace` parity).
  */
object Marc8 {

  private val Esc = 0x1b

  // character set designations (LoC MARC-8 escape model)
  private sealed trait Charset
  private case object Ascii extends Charset
  private case object Ansel extends Charset
  private case object GreekSymbols extends Charset
  private case object Superscript extends Charset
  private case object Subscript extends Charset
  private case object Unmapped extends Charset // single-byte sets we replace
  private case object Cjk extends Charset      // EACC multibyte

  /** ANSEL spacing characters (G1 0xA1-0xC8). */
  private val anselSpacing: Map[Int, Char] = Map(
    0xa1 -> 'Ł', 0xa2 -> 'Ø', 0xa3 -> 'Đ', 0xa4 -> 'Þ',
    0xa5 -> 'Æ', 0xa6 -> 'Œ', 0xa7 -> 'ʹ', 0xa8 -> '·',
    0xa9 -> '♭', 0xaa -> '®', 0xab -> '±', 0xac -> 'Ơ',
    0xad -> 'Ư', 0xae -> 'ʼ', 0xb0 -> 'ʻ', 0xb1 -> 'ł',
    0xb2 -> 'ø', 0xb3 -> 'đ', 0xb4 -> 'þ', 0xb5 -> 'æ',
    0xb6 -> 'œ', 0xb7 -> 'ʺ', 0xb8 -> 'ı', 0xb9 -> '£',
    0xba -> 'ð', 0xbc -> 'ơ', 0xbd -> 'ư',
    0xc0 -> '°', 0xc1 -> 'ℓ', 0xc2 -> '℗', 0xc3 -> '©',
    0xc4 -> '♯', 0xc5 -> '¿', 0xc6 -> '¡', 0xc7 -> 'ß',
    0xc8 -> '€')

  /** ANSEL combining diacritics (G1 0xE0-0xFE): MARC-8 places them BEFORE
    * the base character; Unicode places them after. */
  private val anselCombining: Map[Int, Char] = Map(
    0xe0 -> '̉', 0xe1 -> '̀', 0xe2 -> '́', 0xe3 -> '̂',
    0xe4 -> '̃', 0xe5 -> '̄', 0xe6 -> '̆', 0xe7 -> '̇',
    0xe8 -> '̈', 0xe9 -> '̌', 0xea -> '̊', 0xeb -> '︠',
    0xec -> '︡', 0xed -> '̕', 0xee -> '̋', 0xef -> '̐',
    0xf0 -> '̧', 0xf1 -> '̨', 0xf2 -> '̣', 0xf3 -> '̤',
    0xf4 -> '̥', 0xf5 -> '̳', 0xf6 -> '̲', 0xf7 -> '̦',
    0xf8 -> '̜', 0xf9 -> '̮', 0xfa -> '︢', 0xfb -> '︣',
    0xfe -> '̓')

  private val greekSymbols: Map[Int, Char] =
    Map(0x61 -> 'α', 0x62 -> 'β', 0x63 -> 'γ')

  private val superscripts: Map[Int, Char] = Map(
    '0'.toInt -> '⁰', '1'.toInt -> '¹', '2'.toInt -> '²',
    '3'.toInt -> '³', '4'.toInt -> '⁴', '5'.toInt -> '⁵',
    '6'.toInt -> '⁶', '7'.toInt -> '⁷', '8'.toInt -> '⁸',
    '9'.toInt -> '⁹', '+'.toInt -> '⁺', '-'.toInt -> '⁻',
    '('.toInt -> '⁽', ')'.toInt -> '⁾')

  private val subscripts: Map[Int, Char] = Map(
    '0'.toInt -> '₀', '1'.toInt -> '₁', '2'.toInt -> '₂',
    '3'.toInt -> '₃', '4'.toInt -> '₄', '5'.toInt -> '₅',
    '6'.toInt -> '₆', '7'.toInt -> '₇', '8'.toInt -> '₈',
    '9'.toInt -> '₉', '+'.toInt -> '₊', '-'.toInt -> '₋',
    '('.toInt -> '₍', ')'.toInt -> '₎')

  private def charsetFor(finalByte: Int): Charset = finalByte match {
    case 'B' => Ascii
    case 'E' => Ansel
    case '1' => Cjk
    case 'N' | 'Q' | 'S' | '2' | '3' | '4' => Unmapped
    case _   => Unmapped
  }

  private val NcrPattern = """&#[xX]([0-9A-Fa-f]{1,6});""".r

  /** Transcode a MARC-8 byte range to a UTF-8 (NFC) string. */
  def toUtf8(bytes: Array[Byte], from: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder(len)
    val pending = new java.lang.StringBuilder(4) // buffered combining marks
    var g0: Charset = Ascii
    var g1: Charset = Ansel
    var i = from
    val end = from + len

    @inline def flushAfterBase(): Unit =
      if (pending.length > 0) { sb.append(pending); pending.setLength(0) }

    while (i < end) {
      val b = bytes(i) & 0xff
      if (b == Esc) {
        i += escape(bytes, i, end, g0 = _, g1 = _, sb)
      } else if (b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0d) {
        sb.append(b.toChar); flushAfterBase(); i += 1
      } else {
        val set = if (b < 0x80) g0 else g1
        set match {
          case Cjk =>
            sb.append('�'); flushAfterBase()
            i += 3 // EACC: three bytes per character
          case Ascii if b < 0x80 =>
            sb.append(b.toChar); flushAfterBase(); i += 1
          case Ansel =>
            anselCombining.get(b) match {
              case Some(mark) => pending.append(mark); i += 1
              case None =>
                sb.append(anselSpacing.getOrElse(b, '�')); flushAfterBase(); i += 1
            }
          case GreekSymbols =>
            sb.append(greekSymbols.getOrElse(b, '�')); flushAfterBase(); i += 1
          case Superscript =>
            sb.append(superscripts.getOrElse(b, '�')); flushAfterBase(); i += 1
          case Subscript =>
            sb.append(subscripts.getOrElse(b, '�')); flushAfterBase(); i += 1
          case _ =>
            sb.append('�'); flushAfterBase(); i += 1
        }
      }
    }
    if (pending.length > 0) sb.append(pending) // trailing orphan diacritics

    // totality: an out-of-range NCR (e.g. &#xFFFFFF; > U+10FFFF) must map to
    // U+FFFD, never throw — one corrupt record must not kill a read job
    val expanded = NcrPattern.replaceAllIn(sb.toString, m => {
      val cp = Integer.parseInt(m.group(1), 16)
      scala.util.matching.Regex.quoteReplacement(
        if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
        else "�")
    })
    Normalizer.normalize(expanded, Normalizer.Form.NFC)
  }

  /** Parse one escape sequence starting at `i` (bytes(i) == ESC); apply the
    * designation via setters; return the number of bytes consumed. */
  private def escape(bytes: Array[Byte], i: Int, end: Int,
                     setG0: Charset => Unit, setG1: Charset => Unit,
                     sb: java.lang.StringBuilder): Int = {
    if (i + 1 >= end) { sb.append('�'); return 1 }
    (bytes(i + 1) & 0xff) match {
      case 's' => setG0(Ascii); 2
      case 'g' => setG0(GreekSymbols); 2
      case 'p' => setG0(Superscript); 2
      case 'b' => setG0(Subscript); 2
      case c @ ('(' | ',' | ')' | '-') =>
        // optional '!' intermediate before the final byte (e.g. ESC (!E)
        var j = i + 2
        if (j < end && bytes(j) == '!') j += 1
        if (j >= end) { sb.append('�'); return 2 }
        val cs = charsetFor(bytes(j) & 0xff)
        if (c == '(' || c == ',') setG0(cs) else setG1(cs)
        j - i + 1
      case '$' =>
        // multibyte designation: ESC $ [,)-]? final
        var j = i + 2
        if (j < end && (bytes(j) == ',' || bytes(j) == ')' || bytes(j) == '-')) j += 1
        if (j >= end) { sb.append('�'); return 2 }
        val toG1 = j > i + 2 && (bytes(j - 1) == ')' || bytes(j - 1) == '-')
        val cs = charsetFor(bytes(j) & 0xff)
        if (toG1) setG1(cs) else setG0(cs)
        j - i + 1
      case _ =>
        sb.append('�'); 1 // unknown escape: replace the ESC, resume
    }
  }
}
