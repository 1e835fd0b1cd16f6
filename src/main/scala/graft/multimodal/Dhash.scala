package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded pixel raster for perceptual hashing: per-pixel luminance SUMS
  * (r+g+b, 0..765 — kept as integer sums, never divided, so every
  * downstream comparison is exact integer arithmetic an oracle can
  * replay), top-down row-major. */
case class RasterPixels(width: Int, height: Int, channels: Int,
    lum: Array[Int])

/**
 * Perceptual image hashing for multimodal dedup: dHash (difference
 * hash — Krawetz's gradient hash, the standard cheap perceptual
 * fingerprint) over a decoded raster. The image is reduced to a 9×8
 * grid of cell luminances and each of the 64 bits records whether the
 * right cell of a horizontal pair is brighter than the left — robust to
 * brightness/contrast shifts and mild recompression, which is exactly
 * what near-duplicate images in a crawled training corpus differ by.
 *
 * Everything here is EXACT integer arithmetic (integer cell boundaries,
 * cross-multiplied mean comparisons, no floats), so the full
 * decode→downsample→hash chain is replayable by the DuckDB oracle over
 * the deterministic synthetic payloads — the same property that made
 * `multimodal_decode_stats` hash-green.
 *
 * Pairing reuses the Manku-style wide-key Hamming banding already
 * proven on text fingerprints ([[graft.dedup.TextDedup.hammingPairsWide]]):
 * 4 chunks of 16 bits, exact pigeonhole recall for Hamming ≤ 3.
 */
object Dhash {

  /** Grid: 9 columns × 8 rows → 8 horizontal comparisons per row ×
    * 8 rows = 64 bits. */
  val GridW = 9
  val GridH = 8

  /**
   * 64-bit difference hash of a luminance raster. Cell (i, j) covers
   * pixel columns [i·W/GW, max(i·W/GW+1, (i+1)·W/GW)) and rows
   * [j·H/GH, max(j·H/GH+1, (j+1)·H/GH)) (integer division; the
   * max(lo+1, …) guard keeps every cell non-empty when the image is
   * smaller than the grid — cells then overlap, deterministically).
   * Bit j·8+i is set iff cell (i+1, j)'s mean luminance is strictly
   * greater than cell (i, j)'s, compared exactly via cross
   * multiplication (sumR·cntL > sumL·cntR) — no float means, no ties
   * ambiguity.
   */
  def dhash64(width: Int, height: Int, lum: Array[Int]): Long = {
    require(width > 0 && height > 0 && lum.length >= width * height,
      "raster must be non-empty with w*h luminance entries")
    val sums = new Array[Long](GridW * GridH)
    val cnts = new Array[Long](GridW * GridH)
    var gj = 0
    while (gj < GridH) {
      val ylo = gj * height / GridH
      val yhi = math.min(height, math.max(ylo + 1, (gj + 1) * height / GridH))
      var gi = 0
      while (gi < GridW) {
        val xlo = gi * width / GridW
        val xhi = math.min(width, math.max(xlo + 1, (gi + 1) * width / GridW))
        var s = 0L; var c = 0L
        var y = ylo
        while (y < yhi) {
          var x = xlo
          while (x < xhi) { s += lum(y * width + x); c += 1; x += 1 }
          y += 1
        }
        sums(gj * GridW + gi) = s
        cnts(gj * GridW + gi) = c
        gi += 1
      }
      gj += 1
    }
    var hash = 0L
    var j = 0
    while (j < GridH) {
      var i = 0
      while (i < GridW - 1) {
        val l = j * GridW + i
        if (sums(l + 1) * cnts(l) > sums(l) * cnts(l + 1))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  /** Decode any supported payload (BMP → PPM → javax.imageio, the same
    * precedence as [[Multimodal.decodeOne]]) to a luminance raster;
    * None for undecodable payloads (they get no fingerprint, like
    * token-less documents get no simhash). */
  def decodePixels(bytes: Array[Byte]): Option[RasterPixels] = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    try bmpPixels(b).orElse(ppmPixels(b)).orElse(imageIoPixels(b))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pixel decode of an uncompressed 24/32-bpp BMP — same validation as
    * [[Bmp.decode]], but materializing the top-down luminance raster
    * (bottom-up file order and negative-height top-down both handled). */
  private[multimodal] def bmpPixels(bytes: Array[Byte]): Option[RasterPixels] = {
    if (!Bmp.isBmp(bytes)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (width <= 0 || rawHeight == 0 || rawHeight == Int.MinValue ||
      compression != 0 || (bpp != 24 && bpp != 32)) return None
    if (dataOffset < 54 || dataOffset > bytes.length) return None
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val channels = bpp / 8
    val strideL = (width.toLong * channels + 3) / 4 * 4
    if (strideL > bytes.length - dataOffset ||
      strideL * height > bytes.length - dataOffset) return None
    val stride = strideL.toInt
    val lum = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val imgY = if (topDown) y else height - 1 - y
      val row = dataOffset + y * stride
      var x = 0
      while (x < width) {
        val p = row + x * channels
        lum(imgY * width + x) = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
          (bytes(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(RasterPixels(width, height, channels, lum))
  }

  /** Pixel decode of binary PPM (P6, maxval 255) — top-down by format. */
  private[multimodal] def ppmPixels(bytes: Array[Byte]): Option[RasterPixels] = {
    if (!Ppm.isPpm(bytes)) return None
    // Header parse mirrors Ppm.decode (ASCII ints, # comments).
    var i = 2
    def skipSpace(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else in = false
      }
    }
    def int(): Int = {
      skipSpace()
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i).toChar.isDigit) {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    val (w, h, maxv) = (int(), int(), int())
    if (w <= 0 || h <= 0 || maxv != 255) return None
    i += 1
    if (i.toLong + 3L * w * h > bytes.length) return None
    val lum = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      val off = i + p * 3
      lum(p) = (bytes(off) & 0xff) + (bytes(off + 1) & 0xff) +
        (bytes(off + 2) & 0xff)
      p += 1
    }
    Some(RasterPixels(w, h, 3, lum))
  }

  /** Pixel decode via the JDK codec (PNG/GIF/JPEG), sRGB, alpha ignored
    * as non-color — same channel treatment as [[ImageIoCodec.decode]]. */
  private[multimodal] def imageIoPixels(bytes: Array[Byte]): Option[RasterPixels] = {
    if (!ImageIoCodec.looksSupported(bytes)) return None
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        lum(y * w + x) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    Some(RasterPixels(w, h, img.getColorModel.getNumColorComponents, lum))
  }
}
