package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Pixel-level perceptual image hash (dHash): decode the payload with
  * the JDK's bundled `javax.imageio` readers (PNG/JPEG/GIF/BMP — zero
  * new dependencies), average-pool the integer luma into a 9×8 grid,
  * and emit the 64-bit gradient signature — bit r*8+c set iff
  * g(r,c) < g(r,c+1).
  *
  * This is the pixel-space twin of [[BinarySimhashExpression]] (mm05):
  * byte-level SimHash is blind to RE-ENCODES — the same pixels saved at
  * a different compression level/format share almost no byte n-grams —
  * while the dHash depends only on DECODED luma gradients, which
  * lossless re-encodes preserve exactly and high-quality lossy
  * re-encodes preserve for any comparison whose luma margin exceeds the
  * codec noise. Signatures band through the shared pigeonhole machinery
  * ([[graft.ops.Dedup.simhashPairsFromSigs]]).
  *
  * Determinism: the pooling is pure integer arithmetic over decoded
  * pixels (luma = (299r+587g+114b)/1000, block sums, floor division) —
  * no Graphics2D resampling, whose interpolation is
  * implementation-defined. PNG decode is bit-exact by spec, so
  * PNG-pixel-identical payloads hash identically on any JVM.
  *
  * NULL for null payloads and for anything imageio cannot decode
  * (garbage, truncation, unsupported formats) — undecodable payloads
  * simply cannot near-dup. Total: never throws.
  */
case class ImageDHashExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val bytes = childValue.asInstanceOf[Array[Byte]]
    if (bytes == null) return null
    ImageDHashExpression.dhash(bytes) match {
      case Some(sig) => java.lang.Long.valueOf(sig)
      case None => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDHashExpression {

  def imageDHash(payload: Column): Column =
    ColumnBridge.column(ImageDHashExpression(ColumnBridge.expression(payload)))

  /** ImageIO's default stream cache is a TEMP FILE per read — on a
    * corpus where most payloads are undecodable noise that is a disk
    * round-trip per ROW just to learn "not an image". Memory-cached
    * streams decode bit-identically (the cache only buffers bytes for
    * reader seeks); JVM-global, set once. */
  private lazy val memoryCachedStreams: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Fast reject before reader probing: the JDK's bundled readers
    * (PNG/JPEG/GIF/BMP/TIFF/WBMP) each anchor on a leading magic, so a
    * payload matching none of them cannot decode — `ImageIO.read` would
    * iterate every registered reader (stream create + probe + reset)
    * just to return null. WBMP's "magic" is the weakest (type byte 0,
    * fix-header byte 0), kept bit-exact so the decodable set — and
    * therefore every signature — is unchanged. */
  private[graft] def maybeImage(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 4) return false
    val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
    val b2 = bytes(2) & 0xFF; val b3 = bytes(3) & 0xFF
    (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // PNG
    (b0 == 0xFF && b1 == 0xD8 && b2 == 0xFF) ||            // JPEG
    (b0 == 'G' && b1 == 'I' && b2 == 'F' && b3 == '8') ||  // GIF
    (b0 == 'B' && b1 == 'M') ||                            // BMP
    (b0 == 'I' && b1 == 'I' && b2 == 0x2A && b3 == 0) ||   // TIFF LE
    (b0 == 'M' && b1 == 'M' && b2 == 0 && b3 == 0x2A) ||   // TIFF BE
    (b0 == 0 && b1 == 0)                                   // WBMP
  }

  /** Driver-callable kernel: None = undecodable. */
  def dhash(bytes: Array[Byte]): Option[Long] = {
    if (!maybeImage(bytes)) return None
    memoryCachedStreams
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) return None
    try Some(dhashOfGrid(lumaGrid(img)))
    catch { case _: Throwable => None }
  }

  /** 9×8 average-pooled integer luma grid (grid(r)(c), r<8, c<9). Each
    * cell averages the pixel block [floor(cW/9), floor((c+1)W/9)) ×
    * [floor(rH/8), floor((r+1)rH/8)); degenerate (too-small) images pin
    * empty blocks to their nearest pixel. */
  private[graft] def lumaGrid(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = Array.ofDim[Int](8, 9)
    // block bounds: x0 = floor(cW/9) < W always; x1 clamps to W and is
    // forced past x0, so every block holds >= 1 pixel even when W < 9
    var r = 0
    while (r < 8) {
      val y0 = (r.toLong * h / 8).toInt
      val y1 = math.min(h, math.max(y0 + 1, ((r + 1).toLong * h / 8).toInt))
      var c = 0
      while (c < 9) {
        val x0 = (c.toLong * w / 9).toInt
        val x1 = math.min(w, math.max(x0 + 1, ((c + 1).toLong * w / 9).toInt))
        var sum = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            sum += lum
            n += 1
            x += 1
          }
          y += 1
        }
        grid(r)(c) = (sum / n).toInt
        c += 1
      }
      r += 1
    }
    grid
  }

  /** bit r*8+c set iff grid(r)(c) < grid(r)(c+1). */
  private[graft] def dhashOfGrid(grid: Array[Array[Int]]): Long = {
    var sig = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r)(c) < grid(r)(c + 1)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }
}
