package graft.sources

import java.io.InputStream
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

  /** Leader-only decode: IDENTICAL acceptance and cursor advance to
    * [[decodeAt]] (both reject on the same header checks and resync the
    * same way), but never touches the directory, field data, or the
    * character decoder — the scan path when a query projects only the
    * leader and/or the metadata columns (row counts must match the full
    * decode exactly, or pruning would change query results). */
  def decodeLeaderAt(bytes: Array[Byte], offset: Int): (Option[String], Int) = {
    if (offset + LeaderLength > bytes.length) return (None, bytes.length)
    val recLen = asciiInt(bytes, offset, 5).getOrElse(0)
    if (recLen < LeaderLength) {
      var i = offset
      while (i < bytes.length && bytes(i) != RecordTerminator) i += 1
      return (None, math.min(i + 1, bytes.length))
    }
    (Some(str(bytes, offset, LeaderLength)), offset + recLen)
  }

  /** Decode one record from `bytes` starting at `offset`; returns the
    * record (None if malformed) and the offset just past it.
    *
    * `tagFilter` skips non-matching directory entries before any field
    * data is read or decoded (the source-level interesting-tags
    * optimization — the resulting record carries ONLY matching fields). */
  def decodeAt(bytes: Array[Byte], offset: Int,
               dec: ValueDecoder = Utf8Replace,
               tagFilter: String => Boolean = null): (Option[MarcRecord], Int) = {
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
      if (flen > 0 && from < to && (tagFilter == null || tagFilter(tag))) {
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
    * /root/reference/lib/traject/macros/marc21.rb:164-173).
    *
    * Hot path of `serialized_marc` / marcout: one growable byte buffer and
    * in-place digit writes — no per-field streams, no intermediate
    * directory strings. Byte-identical to the straightforward
    * stream-append formulation (round-trip pinned by SourcesSpec). */
  def encode(rec: MarcRecord, allowOversized: Boolean = false): Array[Byte] = {
    val fields = rec.fields
    val n = fields.length
    var data = new Array[Byte](2048)
    var dlen = 0
    @inline def ensure(extra: Int): Unit =
      if (dlen + extra > data.length) {
        var cap = data.length << 1
        while (cap < dlen + extra) cap <<= 1
        data = java.util.Arrays.copyOf(data, cap)
      }
    @inline def put(b: Byte): Unit = { ensure(1); data(dlen) = b; dlen += 1 }
    @inline def putStr(s: String): Unit = {
      // fast path: ASCII copied char-by-char, no encoder/array allocation
      val len = s.length
      var ascii = true
      var i = 0
      while (ascii && i < len) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
      if (ascii) {
        ensure(len)
        i = 0
        while (i < len) { data(dlen + i) = s.charAt(i).toByte; i += 1 }
        dlen += len
      } else {
        val bs = s.getBytes(UTF_8)
        ensure(bs.length)
        System.arraycopy(bs, 0, data, dlen, bs.length)
        dlen += bs.length
      }
    }
    val fieldLens = new Array[Int](n)
    val fieldOffs = new Array[Int](n)
    var fi = 0
    while (fi < n) {
      val f = fields(fi)
      val start = dlen
      fieldOffs(fi) = start
      if (f.isControl) putStr(f.value)
      else {
        putStr(orBlank(f.ind1))
        putStr(orBlank(f.ind2))
        val subs = f.subfields
        val m = subs.length
        var si = 0
        while (si < m) {
          val sf = subs(si)
          put(SubfieldDelimiter)
          putStr(sf.code)
          putStr(sf.value)
          si += 1
        }
      }
      put(FieldTerminator)
      fieldLens(fi) = dlen - start
      fi += 1
    }
    // directory entries are tag + 4-digit length + 5-digit start; tags are
    // 3 ASCII bytes in any legal record, but a non-ASCII tag falls back to
    // its UTF-8 bytes exactly like the string-append formulation did
    var dirLen = 0
    fi = 0
    while (fi < n) { dirLen += utf8Len(fields(fi).tag) + 9; fi += 1 }
    val base = LeaderLength + dirLen + 1
    val total = base + dlen + 1
    val leader0 = {
      val l = rec.leader
      if (l != null && l.length == LeaderLength) l else " " * LeaderLength
    }
    val out = new Array[Byte](total)
    writeNum(out, 0, total, 5, allowOversized)
    writeAscii(out, 5, leader0, 5, 12)
    writeNum(out, 12, base, 5, allowOversized)
    writeAscii(out, 17, leader0, 17, 24)
    var pos = LeaderLength
    fi = 0
    while (fi < n) {
      val tag = fields(fi).tag
      pos = writeStr(out, pos, tag)
      writeNum(out, pos, fieldLens(fi), 4, allowOversized); pos += 4
      writeNum(out, pos, fieldOffs(fi), 5, allowOversized); pos += 5
      fi += 1
    }
    out(pos) = FieldTerminator
    System.arraycopy(data, 0, out, base, dlen)
    out(total - 1) = RecordTerminator
    out
  }

  private def orBlank(s: String): String =
    if (s == null || s.isEmpty) " " else s.take(1)

  @inline private def utf8Len(s: String): Int = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s.length else s.getBytes(UTF_8).length
  }

  private def writeStr(out: Array[Byte], pos: Int, s: String): Int = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      i = 0
      while (i < s.length) { out(pos + i) = s.charAt(i).toByte; i += 1 }
      pos + s.length
    } else {
      val bs = s.getBytes(UTF_8)
      System.arraycopy(bs, 0, out, pos, bs.length)
      pos + bs.length
    }
  }

  /** leader substring copy — leaders are ASCII by spec; a stray non-ASCII
    * char degrades to '?' exactly like the charset encoder would multi-byte
    * it (out-of-contract input either way). */
  private def writeAscii(out: Array[Byte], pos: Int, s: String, from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      out(pos + (i - from)) = if (c < 0x80) c.toByte else '?'.toByte
      i += 1
    }
  }

  private def writeNum(out: Array[Byte], pos: Int, v: Int, width: Int,
                       allowOversized: Boolean): Unit = {
    var digits = 1
    var p = 10
    while (digits < 10 && v >= p) { digits += 1; p *= 10 }
    if (digits > width) {
      if (allowOversized) {
        var i = 0
        while (i < width) { out(pos + i) = '0'; i += 1 }
      } else throw new IllegalArgumentException(
        s"field too large for ISO 2709: $v > ${width} digits")
    } else {
      var i = width - 1
      var rem = v
      while (i >= width - digits) {
        out(pos + i) = ('0' + rem % 10).toByte
        rem /= 10
        i -= 1
      }
      while (i >= 0) { out(pos + i) = '0'; i -= 1 }
    }
  }

  def readAll(in: InputStream): Vector[MarcRecord] = decodeAll(in.readAllBytes())
}
