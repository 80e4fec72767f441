package graft.sources

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** MARC-8 transcoding goldens mirroring the reference's marc_reader tests
  * (/root/reference/test/marc_reader_test.rb:40-72; fixtures one-marc8.mrc
  * and escaped_character_reference.marc8.marc, synthesized here byte for
  * byte from their described content). */
class Marc8UnitSpec extends AnyFunSuite {

  private def m8(parts: Any*): Array[Byte] = parts.flatMap {
    case s: String => s.getBytes("ASCII").toSeq
    case i: Int    => Seq(i.toByte)
    case b: Byte   => Seq(b)
  }.toArray

  private def t(bytes: Array[Byte]): String = Marc8.toUtf8(bytes, 0, bytes.length)

  test("ANSEL combining diacritics reorder and compose (one-marc8.mrc 245a)") {
    // MARC-8: diacritic BEFORE base; cedilla 0xF0 + c, tilde 0xE4 + a
    val bytes = m8("Por uma outra globaliza", 0xf0, "c", 0xe4, "a", "o :")
    assert(t(bytes) == "Por uma outra globalização :")
  }

  test("ANSEL spacing characters map") {
    assert(t(m8(0xb2)) == "ø")
    assert(t(m8(0xa5, 0xb5)) == "Ææ")
    assert(t(m8(0xb8)) == "ı")
    assert(t(m8(0xc8)) == "€")
  }

  test("multiple diacritics on one base stay attached (NFC where possible)") {
    // acute 0xE2 before 'e' composes to é
    assert(t(m8(0xe2, "e")) == "é")
    // two diacritics: NFC composes what it can (x+diaeresis → ẍ) and keeps
    // the rest as a combining mark in canonical order
    assert(t(m8(0xe8, 0xf0, "x")) == "ẍ̧")
  }

  test("numeric character references expand (escaped_character_reference fixture)") {
    val bytes = m8("Rio de Janeiro escaped replacement char: &#xFFFD; .")
    assert(t(bytes) == "Rio de Janeiro escaped replacement char: � .")
    assert(t(m8("&#x0301;x")) == "́x")
  }

  test("out-of-range numeric character references replace, never throw") {
    // 6 hex digits can exceed U+10FFFF; invalid: :replace must stay total
    assert(t(m8("bad: &#xFFFFFF; ref")) == "bad: � ref")
    assert(t(m8("&#x110000;")) == "�")
    // max valid code point still expands
    assert(t(m8("&#x10FFFF;")) == new String(Character.toChars(0x10FFFF)))
  }

  test("escape sequences: greek symbols, super/subscript, and back to ASCII") {
    assert(t(m8(0x1b, "g", "ab", 0x1b, "s", "x")) == "αβx")
    assert(t(m8(0x1b, "p", "2", 0x1b, "s")) == "²")
    assert(t(m8(0x1b, "b", "2", 0x1b, "s")) == "₂")
  }

  test("unmapped charsets replace per code point but keep alignment") {
    // ESC ( N = basic Cyrillic (not carried): each byte -> U+FFFD, then back
    val s = t(m8(0x1b, "(", "N", "ab", 0x1b, "(", "B", "ok"))
    assert(s == "��ok")
    // EACC multibyte consumes 3 bytes per character
    val s2 = t(m8(0x1b, "$", "1", "abcdef", 0x1b, "(", "B", "z"))
    assert(s2 == "��z")
  }

  test("spaces pass through in any charset") {
    assert(t(m8(0x1b, "(", "N", "a", " ", "b", 0x1b, "(", "B")) == "� �")
  }

  test("unknown encoding name raises like the reference ArgumentError") {
    val e = intercept[IllegalArgumentException](Iso2709.decoderFor("ADFADFADF"))
    assert(e.getMessage.contains("Unrecognized"))
  }
}

class Marc8ReadSpec extends SparkSpec {

  /** Hand-build one ISO-2709 record whose 245$a holds raw MARC-8 bytes. */
  private def buildMarc8Record(valueBytes: Array[Byte]): Array[Byte] = {
    val body = Array[Byte]('1', '0', 0x1f, 'a') ++ valueBytes ++ Array[Byte](0x1e)
    val base = 24 + 12 + 1
    val total = base + body.length + 1
    val leader = f"$total%05d" + "nam  22" + f"$base%05d" + "   4500"
    val dir = f"245${body.length}%04d00000"
    leader.getBytes("ASCII") ++ dir.getBytes("ASCII") ++ Array[Byte](0x1e) ++
      body ++ Array[Byte](0x1d)
  }

  test("marc DSv2 reads MARC-8 via option(encoding) with transcode") {
    val valueBytes =
      "Por uma outra globaliza".getBytes("ASCII") ++ Array[Byte](0xf0.toByte) ++
        "c".getBytes ++ Array[Byte](0xe4.toByte) ++ "a".getBytes ++ "o :".getBytes
    val dir = Files.createTempDirectory("marc8").toString
    Files.write(Paths.get(dir, "m8.mrc"), buildMarc8Record(valueBytes))

    val rec = MarcIo.readBinary(spark, s"$dir/m8.mrc", encoding = "MARC-8").collect().head
    assert(rec.fields.head.subfields.head.value == "Por uma outra globalização :")

    // same bytes read as UTF-8 get replacement chars instead (invalid: :replace)
    val utf = MarcIo.readBinary(spark, s"$dir/m8.mrc").collect().head
    assert(utf.fields.head.subfields.head.value.contains("�"))
  }

  test("marc DSv2 rejects unknown encodings eagerly") {
    val dir = Files.createTempDirectory("marc8bad").toString
    Files.write(Paths.get(dir, "m8.mrc"), buildMarc8Record("x".getBytes("ASCII")))
    intercept[Exception] {
      MarcIo.readBinary(spark, s"$dir/m8.mrc", encoding = "ADFADFADF").collect()
    }
  }
}
