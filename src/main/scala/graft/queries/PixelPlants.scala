package graft.queries

import java.awt.image.BufferedImage

/** mm07's fixture-build-time plant generator — the [[graft.tools
  * .PlantSearch]] analogue for pixel hashes, but ANALYTIC: instead of
  * searching a pool for byte strings at known SimHash distances, the
  * dHash is constructed directly. Each 9×8 grayscale grid is built from
  * a desired 64-bit gradient pattern by walking each row ±14 luma per
  * step (range stays in [16, 240]), so
  * `dhash(grid) == the chosen bit pattern` by construction and
  * `distance(base, variant(k)) == k` exactly. Lossless encodes (PNG for
  * side a, BMP for side b — byte-disjoint streams, identical pixels)
  * keep that exact; the JPEG pair uses a 40/215 checkerboard whose
  * 175-luma comparison margins dwarf codec noise, so its re-encode
  * hashes identically (distance 0) despite lossy bytes. */
private[graft] object PixelPlants {

  /** base gradient bits: alternate up/down along each row. */
  private def baseBit(r: Int, c: Int): Boolean = c % 2 == 0

  /** variant k flips the first k bit positions (p = r*8+c). */
  private def bit(k: Int)(r: Int, c: Int): Boolean = {
    val p = r * 8 + c
    if (p < k) !baseBit(r, c) else baseBit(r, c)
  }

  private def gridOf(bitAt: (Int, Int) => Boolean): Array[Array[Int]] = {
    val g = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      g(r)(0) = 128
      var c = 0
      while (c < 8) {
        g(r)(c + 1) = g(r)(c) + (if (bitAt(r, c)) 14 else -14)
        c += 1
      }
      r += 1
    }
    g
  }

  def baseGrid: Array[Array[Int]] = gridOf(baseBit)
  def variantGrid(k: Int): Array[Array[Int]] = gridOf(bit(k))

  /** 40/215 checkerboard: every dHash comparison has a 175-luma margin. */
  def checkerGrid: Array[Array[Int]] = {
    val g = Array.ofDim[Int](8, 9)
    for (r <- 0 until 8; c <- 0 until 9)
      g(r)(c) = if ((r + c) % 2 == 0) 40 else 215
    g
  }

  def image(grid: Array[Array[Int]]): BufferedImage = {
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until 8; c <- 0 until 9) {
      val v = grid(r)(c)
      img.setRGB(c, r, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  def png(grid: Array[Array[Int]]): Array[Byte] = encode(image(grid), "png")
  def bmp(grid: Array[Array[Int]]): Array[Byte] = encode(image(grid), "bmp")

  def jpeg(grid: Array[Array[Int]], quality: Float = 0.95f): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(image(grid), null, null), param)
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** (payload_a, payload_b) for plant class k: 0..8 = PNG base vs BMP
    * variant-k (distance exactly k, bytes disjoint); 9 = PNG vs JPEG of
    * the checkerboard (lossy re-encode, distance 0). */
  def pair(k: Int): (Array[Byte], Array[Byte]) =
    if (k <= 8) (png(baseGrid), bmp(variantGrid(k)))
    else (png(checkerGrid), jpeg(checkerGrid))
}
