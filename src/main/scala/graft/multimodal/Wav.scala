package graft.multimodal

/** Decoded WAV summary: header facts plus per-clip signal statistics
  * (the audio analogue of image width/height/brightness). */
case class WavInfo(
    sampleRate: Int,
    channels: Int,
    bitsPerSample: Int,
    nFrames: Long,
    durationMs: Double,
    rms: Double,
    peak: Double,
    clipFrac: Double)

/** Raw decoded PCM for fingerprinting: integer samples (16-bit
  * sign-extended / 8-bit centered), channels interleaved. */
case class WavSamples(sampleRate: Int, channels: Int, bits: Int,
    samples: Array[Int])

/**
 * Pure-JVM RIFF/WAVE (PCM) parser and writer — the audio analogue of
 * [[Bmp]]: no external codec, deterministic, truncation-tolerant, used
 * by [[Multimodal.decodeAudio]] inside typed mapPartitions.
 *
 * Supported: canonical RIFF container, `fmt ` chunk with PCM
 * (audioFormat=1), 8-bit unsigned or 16-bit signed little-endian
 * samples, any channel count. Chunk walk skips unknown chunks
 * (word-aligned, as RIFF requires) and tolerates a `data` chunk whose
 * declared size overruns the buffer (truncated uploads decode their
 * available prefix — same policy as the WET gzip scan).
 *
 * Statistics are computed over samples normalized to [-1, 1):
 * `rms` (root mean square), `peak` (max |s|), `clipFrac` (fraction of
 * samples at the format's min/max representable value — digital
 * clipping).
 */
object Wav {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def decode(b: Array[Byte]): Option[WavInfo] = {
    if (b == null || b.length < 12) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, length (clamped)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, off)
      val declared = le32(b, off + 4)
      val bodyStart = off + 8
      val avail = math.max(0L, math.min(declared, (b.length - bodyStart).toLong))
      id match {
        case "fmt " if avail >= 16 =>
          fmt = Some((le16(b, bodyStart), le16(b, bodyStart + 2),
            le32(b, bodyStart + 4).toInt, le16(b, bodyStart + 14)))
        case "data" =>
          data = Some((bodyStart, avail.toInt))
        case _ => ()
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      off = bodyStart + declared.toInt + (declared.toInt & 1)
      if (off <= bodyStart) return None // corrupt size loop guard
    }
    for {
      (audioFormat, channels, rate, bits) <- fmt
      if audioFormat == 1 && (bits == 8 || bits == 16) &&
        channels > 0 && rate > 0
      (dOff, dLen) <- data
    } yield {
      val bytesPerSample = bits / 8
      val n = dLen / bytesPerSample
      var sumSq = 0.0
      var peak = 0.0
      var clipped = 0L
      var i = 0
      while (i < n) {
        val (s, isClip) =
          if (bits == 16) {
            val raw = (le16(b, dOff + i * 2) << 16) >> 16 // sign-extend
            (raw / 32768.0, raw == 32767 || raw == -32768)
          } else {
            val raw = b(dOff + i) & 0xff
            ((raw - 128) / 128.0, raw == 0 || raw == 255)
          }
        sumSq += s * s
        val a = math.abs(s)
        if (a > peak) peak = a
        if (isClip) clipped += 1
        i += 1
      }
      val frames = n.toLong / channels
      WavInfo(rate, channels, bits, frames,
        frames * 1000.0 / rate,
        if (n == 0) 0.0 else math.sqrt(sumSq / n),
        peak,
        if (n == 0) 0.0 else clipped.toDouble / n)
    }
  }

  /** Raw integer samples for fingerprinting: 16-bit → sign-extended,
    * 8-bit → raw−128 (centered), channels interleaved as stored. Same
    * chunk walk and truncation tolerance as [[decode]]. */
  def decodeSamples(b: Array[Byte]): Option[WavSamples] = {
    if (b == null || b.length < 12) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, off)
      val declared = le32(b, off + 4)
      val bodyStart = off + 8
      val avail = math.max(0L, math.min(declared, (b.length - bodyStart).toLong))
      id match {
        case "fmt " if avail >= 16 =>
          fmt = Some((le16(b, bodyStart), le16(b, bodyStart + 2),
            le32(b, bodyStart + 4).toInt, le16(b, bodyStart + 14)))
        case "data" => data = Some((bodyStart, avail.toInt))
        case _ => ()
      }
      off = bodyStart + declared.toInt + (declared.toInt & 1)
      if (off <= bodyStart) return None
    }
    for {
      (audioFormat, channels, rate, bits) <- fmt
      if audioFormat == 1 && (bits == 8 || bits == 16) &&
        channels > 0 && rate > 0
      (dOff, dLen) <- data
    } yield {
      val bytesPerSample = bits / 8
      val n = dLen / bytesPerSample
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          if (bits == 16) (le16(b, dOff + i * 2) << 16) >> 16
          else (b(dOff + i) & 0xff) - 128
        i += 1
      }
      WavSamples(rate, channels, bits, samples)
    }
  }

  /** Canonical 16-bit PCM little-endian writer (44-byte header). */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "invalid wav params")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Deterministic real-WAV payload from a document: text bytes drive a
    * 16-bit mono 8 kHz waveform (every 97th sample pinned to full scale
    * so clipFrac is exercised). The ENCODER and decode path are real;
    * only the waveform content is synthetic — same stand-in pattern as
    * [[Multimodal.syntheticBmp]]. */
  def syntheticWav(id: Long, text: String): Array[Byte] = {
    val t = if (text == null) Array.empty[Byte]
            else text.getBytes("UTF-8")
    val n = math.max(8, math.min(4096, t.length))
    val samples = Array.tabulate(n) { i =>
      if ((id + i) % 97 == 0) 32767.toShort
      else {
        val b = if (t.isEmpty) ((id * 31 + i) % 251).toInt else t(i % t.length) & 0xff
        ((b - 128) * 250 + ((id + i) % 17).toInt).toShort
      }
    }
    encode(8000, 1, samples)
  }
}
