package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded raster: dimensions, channel count, and the per-pixel mean
  * intensity in [0,1] (mean over channels and pixels, /255). */
case class Raster(width: Int, height: Int, channels: Int, brightness: Double)

/**
 * Pure-JVM codecs for the two headerful raster formats that need no
 * imaging library: BMP (BITMAPINFOHEADER, uncompressed 24/32-bpp) and
 * binary PPM (P6, maxval 255). These make the multimodal decode path
 * REAL — dimensions come from the parsed header and brightness from the
 * actual pixel bytes (row padding and bottom-up order handled) — while
 * exotic formats still fall back to the labeled stub in [[Multimodal]].
 */
object Bmp {

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  /** Encode an RGB raster (row-major, 3 bytes/pixel, top-down) as an
    * uncompressed 24-bpp bottom-up BMP. Used for fixtures and for
    * synthesizing demo payloads — it is a real, spec-conformant writer
    * (round-trips through any BMP reader). */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val buf = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        buf.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        x += 1
      }
      var i = 0
      while (i < pad) { buf.put(0.toByte); i += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse header + pixels of an uncompressed 24/32-bpp BMP. Returns None
    * for anything this decoder does not cover (other depths, RLE). */
  def decode(bytes: Array[Byte]): Option[Raster] = {
    if (!isBmp(bytes)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (width <= 0 || rawHeight == 0 || rawHeight == Int.MinValue ||
      compression != 0 || (bpp != 24 && bpp != 32)) return None
    // A malformed header can carry any 32-bit dataOffset (negative, or
    // inside the header) and widths whose stride overflows Int — both must
    // be rejected here, not discovered as ArrayIndexOutOfBounds in a task.
    if (dataOffset < 54 || dataOffset > bytes.length) return None
    val height = math.abs(rawHeight) // negative = top-down; same pixels
    val channels = bpp / 8
    val strideL = (width.toLong * channels + 3) / 4 * 4
    // strideL <= bytes.length first, so strideL * height cannot overflow Long
    if (strideL > bytes.length - dataOffset ||
      strideL * height > bytes.length - dataOffset) return None
    val stride = strideL.toInt
    var sum = 0.0
    var y = 0
    while (y < height) {
      val row = dataOffset + y * stride
      var x = 0
      while (x < width) {
        val p = row + x * channels
        // mean of the 3 color channels (alpha, if present, is not color)
        sum += ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
          (bytes(p + 2) & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    Some(Raster(width, height, channels,
      sum / (width.toLong * height) / 255.0))
  }
}

/**
 * JDK-built-in codec path (`javax.imageio` — ships with the JRE, no
 * external library): PNG, GIF and JPEG payloads decode for REAL —
 * dimensions from the decoded raster, brightness from the actual pixel
 * values. Only attempted on payloads whose magic bytes match one of
 * those formats, so the hand-rolled BMP/PPM parsers and the labeled
 * stub keep their behavior for everything else.
 */
object ImageIoCodec {

  /** PNG \x89PNG, GIF87a/GIF89a, JPEG \xFF\xD8\xFF. */
  def looksSupported(b: Array[Byte]): Boolean =
    (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
      b(2) == 'N'.toByte && b(3) == 'G'.toByte) ||
    (b.length >= 4 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte) ||
    (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff)

  def decode(bytes: Array[Byte]): Option[Raster] = {
    if (!looksSupported(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB, alpha ignored as non-color
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        Some(Raster(w, h, img.getColorModel.getNumColorComponents,
          sum / (w.toLong * h) / 255.0))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with `#` comments,
  * then w*h RGB triples. */
object Ppm {

  def isPpm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte

  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  def decode(bytes: Array[Byte]): Option[Raster] = {
    if (!isPpm(bytes)) return None
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
    i += 1 // single whitespace after maxval
    if (i.toLong + 3L * w * h > bytes.length) return None
    var sum = 0.0
    var p = i
    val end = i + 3 * w * h
    while (p < end) {
      sum += ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
        (bytes(p + 2) & 0xff)) / 3.0
      p += 3
    }
    Some(Raster(w, h, 3, sum / (w.toLong * h) / 255.0))
  }
}
