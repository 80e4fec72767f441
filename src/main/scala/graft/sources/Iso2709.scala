package graft.sources

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import graft.marc.{MarcField, MarcRecord, Subfield}

/** ISO 2709 / MARC21 binary record framing codec.
  *
  * Implements the public ISO 2709 layout (also summarized in the Library of
  * Congress MARC21 specification): a 24-byte leader whose bytes 0-4 are the
  * ASCII record length and 12-16 the base address of data; a directory of
  * 12-byte entries (3-byte tag, 4-byte field length, 5-byte start offset)
  * terminated by the field terminator 0x1E; field data at the base address
  * with subfields delimited by 0x1F; records terminated by 0x1D.
  *
  * Reads are lenient like the reference's MarcReader with
  * `invalid: :replace` (marc_reader.rb:27-35): undecodable bytes become
  * U+FFFD, malformed directory entries skip the record rather than aborting
  * the split.
  */
object Iso2709 {
  val FieldTerminator: Byte = 0x1e
  val RecordTerminator: Byte = 0x1d
  val SubfieldDelimiter: Byte = 0x1f
  val LeaderLength = 24

  def isControlTag(tag: String): Boolean = tag < "010"

  /** Decodes value bytes to a String. Structural bytes (leader, tags,
    * indicators, lengths) are always ASCII; only field VALUES go through
    * the decoder — matching the reference's per-value transcode
    * (marc_reader.rb:27-35 external_encoding + invalid: :replace). */
  type ValueDecoder = (Array[Byte], Int, Int) => String

  val Utf8Replace: ValueDecoder =
    (b, from, len) => new String(b, from, len, UTF_8) // invalid bytes -> U+FFFD

  val Marc8Decoder: ValueDecoder = (b, from, len) => Marc8.toUtf8(b, from, len)

  /** Resolve `marc_source.encoding` (ArgumentError parity on unknown names,
    * test/marc_reader_test.rb:66-72). */
  def decoderFor(encoding: String): ValueDecoder =
    encoding.toUpperCase.replace("_", "-") match {
      case "UTF-8" | "UTF8" => Utf8Replace
      case "MARC-8" | "MARC8" => Marc8Decoder
      case other => throw new IllegalArgumentException(
        s"Unrecognized marc_source.encoding: $other (supported: UTF-8, MARC-8)")
    }

  private def str(bytes: Array[Byte], from: Int, len: Int): String =
    new String(bytes, from, len, UTF_8) // java replaces invalid sequences with U+FFFD

  private def asciiInt(bytes: Array[Byte], from: Int, len: Int): Option[Int] = {
    var v = 0
    var i = from
    val end = from + len
    while (i < end) {
      val c = bytes(i)
      if (c < '0' || c > '9') return None
      v = v * 10 + (c - '0')
      i += 1
    }
    Some(v)
  }

  /** Does `offset` plausibly start a record? Requires a 5-digit length of
    * at least a leader's worth AND the record terminator where that length
    * claims the record ends (or the record overflowing the buffer). Used by
    * split alignment to distinguish a true record start after an
    * inter-record padding run from padding-class bytes inside field data. */
  def plausibleRecordAt(bytes: Array[Byte], offset: Int): Boolean = {
    if (offset + LeaderLength > bytes.length) return false
    @inline def digit(i: Int): Boolean = {
      val b = bytes(offset + i); b >= '0' && b <= '9'
    }
    var i = 0
    while (i < 5) { if (!digit(i)) return false; i += 1 } // record length
    i = 12
    while (i < 17) { if (!digit(i)) return false; i += 1 } // base address
    // structural directory validation (instead of the old "leader bytes 5-9
    // must not be all digits" heuristic, which silently skipped legal
    // records with all-digit status/type/level flags): the directory must be
    // whole 12-byte entries whose length/start fields (bytes 3-11 of each
    // entry) are digits, terminated by the field terminator at base-1. An
    // offset that actually points inside a real record's all-numeric
    // directory region fails these checks with overwhelming probability.
    val base = asciiInt(bytes, offset + 12, 5).getOrElse(0)
    if (base < LeaderLength + 1) return false
    if ((base - LeaderLength - 1) % 12 != 0) return false
    if (offset + base <= bytes.length && bytes(offset + base - 1) != FieldTerminator)
      return false
    var e = offset + LeaderLength
    val dirEnd = math.min(offset + base - 1, bytes.length)
    while (e + 12 <= dirEnd) {
      var j = 3
      while (j < 12) {
        val b = bytes(e + j); if (b < '0' || b > '9') return false; j += 1
      }
      e += 12
    }
    val recLen = asciiInt(bytes, offset, 5).getOrElse(0)
    recLen >= LeaderLength &&
      (offset + recLen > bytes.length || bytes(offset + recLen - 1) == RecordTerminator)
  }

  /** Decode one record from `bytes` starting at `offset`; returns the
    * record (None if malformed) and the offset just past it. */
  def decodeAt(bytes: Array[Byte], offset: Int,
               dec: ValueDecoder = Utf8Replace): (Option[MarcRecord], Int) = {
    if (offset + LeaderLength > bytes.length) return (None, bytes.length)
    val recLen = asciiInt(bytes, offset, 5).getOrElse(0)
    if (recLen < LeaderLength) {
      // resync: skip to just past the next record terminator
      var i = offset
      while (i < bytes.length && bytes(i) != RecordTerminator) i += 1
      return (None, math.min(i + 1, bytes.length))
    }
    val end = math.min(offset + recLen, bytes.length)
    val leader = str(bytes, offset, LeaderLength)
    val base = asciiInt(bytes, offset + 12, 5).getOrElse(0)

    val fields = Vector.newBuilder[MarcField]
    var d = offset + LeaderLength
    while (d + 11 < end && bytes(d) != FieldTerminator) {
      val tag = str(bytes, d, 3)
      val flen = asciiInt(bytes, d + 3, 4).getOrElse(0)
      val fstart = asciiInt(bytes, d + 7, 5).getOrElse(0)
      val from = offset + base + fstart
      val to = math.min(from + flen, end)
      if (flen > 0 && from < to) {
        // strip the trailing field terminator
        val dataEnd = if (to > from && bytes(to - 1) == FieldTerminator) to - 1 else to
        if (isControlTag(tag)) {
          fields += MarcField.control(tag, dec(bytes, from, dataEnd - from))
        } else if (dataEnd - from >= 2) {
          val ind1 = str(bytes, from, 1)
          val ind2 = str(bytes, from + 1, 1)
          val subs = Vector.newBuilder[Subfield]
          var p = from + 2
          // field body: 0x1F <code> <value> repeated
          while (p < dataEnd) {
            if (bytes(p) == SubfieldDelimiter && p + 1 < dataEnd) {
              val codeStart = p + 1
              var q = codeStart + 1
              while (q < dataEnd && bytes(q) != SubfieldDelimiter) q += 1
              subs += Subfield(str(bytes, codeStart, 1), dec(bytes, codeStart + 1, q - codeStart - 1))
              p = q
            } else p += 1
          }
          fields += MarcField(tag, ind1, ind2, null, subs.result())
        }
      }
      d += 12
    }
    (Some(MarcRecord(leader, fields.result())), offset + recLen)
  }

  /** Decode every record in a byte buffer. */
  def decodeAll(bytes: Array[Byte], dec: ValueDecoder = Utf8Replace): Vector[MarcRecord] = {
    val out = Vector.newBuilder[MarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // skip inter-record padding / newlines
      while (pos < bytes.length &&
        (bytes(pos) == RecordTerminator || bytes(pos) == '\n' || bytes(pos) == '\r' ||
         bytes(pos) == ' ' || bytes(pos) == 0)) pos += 1
      if (pos < bytes.length) {
        val (rec, next) = decodeAt(bytes, pos, dec)
        rec.foreach(out += _)
        pos = math.max(next, pos + 1)
      }
    }
    out.result()
  }

  /** Encode a record; allowOversized pads illegal >99999-byte lengths with
    * zeros like MARC::Writer's allow_oversized (serialized_marc semantics,
    * /root/reference/lib/traject/macros/marc21.rb:164-173). */
  def encode(rec: MarcRecord, allowOversized: Boolean = false): Array[Byte] = {
    val dataBuf = new ByteArrayOutputStream()
    val dirBuf = new StringBuilder
    var offset = 0
    rec.fields.foreach { f =>
      val body = new ByteArrayOutputStream()
      if (f.isControl) body.write(f.value.getBytes(UTF_8))
      else {
        body.write(orBlank(f.ind1).getBytes(UTF_8))
        body.write(orBlank(f.ind2).getBytes(UTF_8))
        f.subfields.foreach { sf =>
          body.write(SubfieldDelimiter)
          body.write(sf.code.getBytes(UTF_8))
          body.write(sf.value.getBytes(UTF_8))
        }
      }
      body.write(FieldTerminator)
      val fieldBytes = body.toByteArray
      dirBuf.append(f.tag)
        .append(num(fieldBytes.length, 4, allowOversized))
        .append(num(offset, 5, allowOversized))
      dataBuf.write(fieldBytes)
      offset += fieldBytes.length
    }
    val directory = dirBuf.toString.getBytes(UTF_8)
    val base = LeaderLength + directory.length + 1
    val total = base + dataBuf.size() + 1
    val leader0 = Option(rec.leader).filter(_.length == LeaderLength)
      .getOrElse((" " * LeaderLength))
    val leader = num(total, 5, allowOversized) + leader0.substring(5, 12) +
      num(base, 5, allowOversized) + leader0.substring(17)
    val out = new ByteArrayOutputStream(total)
    out.write(leader.getBytes(UTF_8))
    out.write(directory)
    out.write(FieldTerminator)
    dataBuf.writeTo(out)
    out.write(RecordTerminator)
    out.toByteArray
  }

  private def orBlank(s: String): String =
    if (s == null || s.isEmpty) " " else s.take(1)

  private def num(v: Int, width: Int, allowOversized: Boolean): String = {
    val s = v.toString
    if (s.length > width) {
      if (allowOversized) "0" * width
      else throw new IllegalArgumentException(s"field too large for ISO 2709: $v > ${width} digits")
    } else ("0" * (width - s.length)) + s
  }

  def readAll(in: InputStream): Vector[MarcRecord] = decodeAll(in.readAllBytes())
}
