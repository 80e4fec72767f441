package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.util.zip.{CRC32, Inflater}

/** Multi-member gzip decoder with EXPLICIT member framing.
  *
  * `java.util.zip.GZIPInputStream` nominally supports concatenated
  * members, but its end-of-member probe consults the wrapped stream's
  * `available()`: when that returns 0 (normal for remote/object-store
  * streams that don't buffer ahead) and the inflater holds ≤26 leftover
  * bytes, it declares EOF at the member boundary — silently dropping
  * every following member. Record-per-member `.warc.gz` (the layout
  * Common Crawl publishes, which makes archives appendable and
  * per-record addressable) is exactly the case that bug eats, so this
  * class owns the framing itself: parse each RFC 1952 member header,
  * inflate with a raw `Inflater(nowrap)`, verify the CRC32/ISIZE
  * trailer, then look for the next member's magic. Bytes the inflater
  * over-read are reclaimed via `Inflater.getRemaining` — nothing
  * depends on `available()`.
  *
  * Error contract (what the WARC reader's truncated-tail handling
  * keys on):
  *  - clean EOF exactly between members → normal end of stream;
  *  - EOF inside a member header, deflate stream, or trailer →
  *    [[EOFException]] ("truncated gzip member") — a tail the writer
  *    died on;
  *  - bad magic / compression method / CRC / ISIZE → [[IOException]] —
  *    corruption, loud.
  */
final class GzipMembersInputStream(raw: InputStream, bufSize: Int = 1 << 16)
    extends InputStream {

  private val src = new Array[Byte](bufSize)
  private var srcPos = 0
  private var srcLen = 0
  private val inf = new Inflater(true)
  private val crc = new CRC32
  private var inMember = false
  private var eof = false
  private val one = new Array[Byte](1)

  /** Ensure ≥1 unread source byte; false at raw EOF. */
  private def fill(): Boolean = {
    if (srcPos < srcLen) return true
    val n = raw.read(src, 0, src.length)
    if (n <= 0) false
    else { srcPos = 0; srcLen = n; true }
  }

  private def readU8(what: String): Int = {
    if (!fill()) throw new EOFException(s"truncated gzip member: EOF in $what")
    val b = src(srcPos) & 0xff
    srcPos += 1
    b
  }

  private def readU16le(what: String): Int =
    readU8(what) | (readU8(what) << 8)

  private def readU32le(what: String): Long =
    readU16le(what).toLong | (readU16le(what).toLong << 16)

  private def skipBytes(n: Int, what: String): Unit = {
    var i = 0
    while (i < n) { readU8(what); i += 1 }
  }

  private def skipZeroTerminated(what: String): Unit = {
    while (readU8(what) != 0) {}
  }

  /** Parse the next member header. False at clean EOF (no more
    * members); EOFException when the header itself is cut short. */
  private def startMember(): Boolean = {
    if (!fill()) return false
    val m1 = readU8("magic")
    val m2 = readU8("magic")
    if (m1 != 0x1f || m2 != 0x8b)
      throw new IOException(
        f"not a gzip member: bad magic 0x$m1%02x 0x$m2%02x")
    val cm = readU8("header")
    if (cm != 8) throw new IOException(s"unsupported gzip method $cm")
    val flg = readU8("header")
    skipBytes(6, "header") // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) skipBytes(readU16le("FEXTRA"), "FEXTRA")
    if ((flg & 0x08) != 0) skipZeroTerminated("FNAME")
    if ((flg & 0x10) != 0) skipZeroTerminated("FCOMMENT")
    if ((flg & 0x02) != 0) skipBytes(2, "FHCRC")
    inf.reset()
    crc.reset()
    inMember = true
    true
  }

  /** CRC32 + ISIZE after the deflate stream ends. */
  private def finishMember(): Unit = {
    // reclaim input bytes the inflater buffered past the deflate end
    srcPos -= inf.getRemaining
    val expectCrc = readU32le("trailer")
    val expectSize = readU32le("trailer")
    if (expectCrc != crc.getValue)
      throw new IOException(
        f"gzip member CRC mismatch: stored 0x$expectCrc%08x, computed 0x${crc.getValue}%08x")
    if (expectSize != (inf.getBytesWritten & 0xffffffffL))
      throw new IOException(
        s"gzip member ISIZE mismatch: stored $expectSize, inflated ${inf.getBytesWritten}")
    inMember = false
  }

  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (true) {
      if (eof) return -1
      if (!inMember) {
        if (!startMember()) { eof = true; return -1 }
      }
      if (inf.finished()) {
        finishMember() // loop: next member or clean EOF
      } else {
        if (inf.needsInput()) {
          if (!fill())
            throw new EOFException("truncated gzip member: EOF in deflate stream")
          inf.setInput(src, srcPos, srcLen - srcPos)
          srcPos = srcLen // consumed tentatively; reclaimed at member end
        }
        val n = inf.inflate(b, off, len)
        if (n > 0) { crc.update(b, off, n); return n }
        // n == 0: either finished (trailer next loop) or needs more input
        if (!inf.finished() && !inf.needsInput())
          throw new IOException("gzip inflate stalled") // needsDictionary: not valid in gzip
      }
    }
    -1 // unreachable
  }

  override def available(): Int = if (eof) 0 else 1

  override def close(): Unit = {
    inf.end()
    raw.close()
  }
}

/** Hard byte cap over a stream: reads report EOF once `remaining` is
  * consumed. Used to bound an indexed `.warc.gz` split to its owned
  * member range — the cap lands exactly on a member boundary, so the
  * framing above sees a clean end-of-stream. */
private[sources] final class LimitedInputStream(in: InputStream,
                                                private var remaining: Long)
    extends InputStream {
  override def read(): Int = {
    if (remaining <= 0) return -1
    val b = in.read()
    if (b >= 0) remaining -= 1
    b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (remaining <= 0) return -1
    val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
    if (n > 0) remaining -= n
    n
  }
  override def close(): Unit = in.close()
}

/** Member-offset sidecar for `.warc.gz`: gzip members are not seekable
  * without an external index, so the writer records each member's
  * (compressed start, uncompressed start) as one tab-separated line in a
  * hidden sibling `.<name>.idx`. Readers that find the sidecar split a
  * gz file like a plain one (member-granular ownership); without it the
  * file stays one partition — pure, honest fallback for third-party
  * archives. The uncompressed column keeps `_record_offset` provenance
  * IDENTICAL between indexed and sequential reads. */
private[graft] object WarcGzIndex {
  def sidecarPath(data: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(data.getParent, s".${data.getName}.idx")

  /** (compressedStarts, uncompressedStarts), validated: first compressed
    * offset 0, strictly increasing. An EMPTY index (zero members — our
    * writer skips empty partitions, but a third-party sidecar may pair
    * with a 0-byte file) is valid and reads as zero rows. */
  def read(fs: org.apache.hadoop.fs.FileSystem,
           data: org.apache.hadoop.fs.Path): (Array[Long], Array[Long]) = {
    val p = sidecarPath(data)
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toArray
      finally in.close()
    val c = new Array[Long](lines.length)
    val u = new Array[Long](lines.length)
    var i = 0
    while (i < lines.length) {
      val tab = lines(i).indexOf('\t')
      if (tab < 0) throw new IOException(s"$p:${i + 1}: malformed index line")
      c(i) = lines(i).substring(0, tab).toLong
      u(i) = lines(i).substring(tab + 1).toLong
      if (i == 0 && c(0) != 0L)
        throw new IOException(s"$p: first member offset ${c(0)} != 0")
      if (i > 0 && (c(i) <= c(i - 1) || u(i) <= u(i - 1)))
        throw new IOException(s"$p:${i + 1}: offsets not increasing")
      i += 1
    }
    (c, u)
  }
}
