package graft.functions

/** Decoded media header: -1 marks a field the format/payload does not
  * provide (PNG has no EXIF orientation; a truncated payload has nothing).
  * `format` is never null ("unknown" when no magic matches). */
final case class MediaInfo(format: String, width: Int, height: Int,
                           orientation: Int, bitDepth: Int)

/** Bounded pure-JVM image header decoder: JPEG (SOF dimensions + EXIF
  * orientation), PNG (IHDR dimensions + bit depth), GIF (logical screen
  * dimensions). No codec dependency — this parses container HEADERS, it
  * does not decompress pixel data, so cost is O(header bytes) per payload
  * regardless of image size and the kernel is safe in a tight partition
  * loop. Total on any input: every read is bounds-checked, malformed or
  * truncated payloads degrade to partial info or "unknown", never throw.
  *
  * Reference behavior (what to extract, not how): the reference treats
  * record payloads as opaque bytes and extracts typed fields; this is the
  * image-container analogue for multimodal curation columns.
  */
object MediaHeader {

  val Unknown: MediaInfo = MediaInfo("unknown", -1, -1, -1, -1)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)

  def decode(b: Array[Byte]): MediaInfo = {
    if (b == null || b.length < 4) return Unknown
    if (b.length >= 8 &&
        u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4e &&
        u8(b, 3) == 0x47 && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a) return png(b)
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) return jpeg(b)
    if (b.length >= 13 && u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
        u8(b, 3) == '8' && (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a')
      return MediaInfo("gif", le16(b, 6), le16(b, 8), -1,
        ((u8(b, 10) >> 4) & 7) + 1)
    Unknown
  }

  /** PNG: IHDR must be the first chunk (spec); width/height are
    * big-endian u32 at offsets 16/20, bit depth at 24. */
  private def png(b: Array[Byte]): MediaInfo = {
    if (b.length < 26 || u8(b, 12) != 'I' || u8(b, 13) != 'H' ||
        u8(b, 14) != 'D' || u8(b, 15) != 'R')
      return MediaInfo("png", -1, -1, -1, -1)
    val w = be32(b, 16)
    val h = be32(b, 20)
    // spec caps dimensions at 2^31-1; a larger value is corruption
    val wi = if (w >= 1 && w <= Int.MaxValue) w.toInt else -1
    val hi = if (h >= 1 && h <= Int.MaxValue) h.toInt else -1
    MediaInfo("png", wi, hi, -1, u8(b, 24))
  }

  /** JPEG: walk the marker stream up to SOS/EOI; SOFn carries precision +
    * dimensions, APP1 may carry EXIF (TIFF IFD0 tag 0x0112 orientation). */
  private def jpeg(b: Array[Byte]): MediaInfo = {
    var i = 2
    var w = -1; var h = -1; var orient = -1; var depth = -1
    var done = false
    while (!done && i + 3 < b.length) {
      if (u8(b, i) != 0xff) done = true // marker desync: stop with what we have
      else {
        val m = u8(b, i + 1)
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m == 0xd9 || m == 0xda) done = true // EOI / start-of-scan
        else {
          val len = be16(b, i + 2)
          if (len < 2 || i + 2 + len > b.length) done = true // truncated segment
          else {
            val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (sof && len >= 7) {
              depth = u8(b, i + 4); h = be16(b, i + 5); w = be16(b, i + 7)
            } else if (m == 0xe1) {
              val o = exifOrientation(b, i + 4, i + 2 + len)
              if (o > 0) orient = o
            }
            i += 2 + len
          }
        }
        if (w >= 0 && orient >= 0) done = true // both found: headers precede scan data
      }
    }
    MediaInfo("jpeg", w, h, orient, depth)
  }

  /** EXIF APP1 body in [from, until): "Exif\0\0" + TIFF; returns IFD0's
    * 0x0112 SHORT value or -1. Offsets are TIFF-relative and untrusted —
    * every dereference re-checks `until`. */
  private def exifOrientation(b: Array[Byte], from: Int, until: Int): Int = {
    if (from + 14 > until) return -1
    if (!(u8(b, from) == 'E' && u8(b, from + 1) == 'x' && u8(b, from + 2) == 'i' &&
          u8(b, from + 3) == 'f' && u8(b, from + 4) == 0 && u8(b, from + 5) == 0))
      return -1
    val base = from + 6
    val bigEndian = u8(b, base) match {
      case 0x4d if u8(b, base + 1) == 0x4d => true
      case 0x49 if u8(b, base + 1) == 0x49 => false
      case _ => return -1
    }
    def g16(i: Int): Int = if (bigEndian) be16(b, i) else le16(b, i)
    def g32(i: Int): Long = if (bigEndian) be32(b, i) else le32(b, i)
    if (g16(base + 2) != 42) return -1
    val ifdOff = g32(base + 4)
    if (ifdOff < 0 || base + ifdOff + 2 > until) return -1
    val ifd = base + ifdOff.toInt
    val count = g16(ifd)
    var e = 0
    while (e < count) {
      val entry = ifd + 2 + e * 12
      if (entry + 12 > until) return -1
      if (g16(entry) == 0x0112 && g16(entry + 2) == 3 && g32(entry + 4) == 1L) {
        val v = g16(entry + 8)
        return if (v >= 1 && v <= 8) v else -1
      }
      e += 1
    }
    -1
  }
}

/** `graft_media_info(payload)` — [[MediaHeader.decode]] as a Catalyst
  * expression returning the full MediaInfo struct
  * `struct<format:string, width:int, height:int, orientation:int,
  * bit_depth:int>`, so the header decoder is reachable from
  * `spark.sql(...)` (registered in
  * [[graft.plans.GraftSqlFunctions]]) and stays inside whole-stage
  * codegen — the kernel is the same bounded JVM method the
  * partition-batched [[graft.ops.Multimodal.decodeHeaders]] uses.
  * Null payload yields null; malformed bytes degrade to "unknown"
  * per the decoder's totality contract. */
case class MediaInfoExpression(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("orientation", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false)))
  override def prettyName: String = "graft_media_info"

  def compute(payload: AnyRef): InternalRow = {
    val m = MediaHeader.decode(payload.asInstanceOf[Array[Byte]])
    InternalRow(UTF8String.fromString(m.format), m.width, m.height,
      m.orientation, m.bitDepth)
  }

  override def nullSafeEval(p: Any): Any = compute(p.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mediaInfoExpr", this,
      classOf[MediaInfoExpression].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $ref.compute($p);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MediaInfoExpression =
    copy(child = newChild)
}

object MediaInfoExpression {
  def mediaInfo(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MediaInfoExpression(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))
}
