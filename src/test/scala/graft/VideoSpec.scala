package graft

import graft.multimodal.{Multimodal, Video}
import org.scalatest.funsuite.AnyFunSuite

class VideoSpec extends AnyFunSuite {

  test("MP4 encode → box-walk round-trip (brand, duration, tracks)") {
    val bytes = Video.encodeMp4(timescale = 600, durationTicks = 1500L,
      nTracks = 2, payload = "hello".getBytes)
    val m = Video.decode(bytes).get
    assert(m.container == "mp4" && m.brand == "isom")
    assert(m.durationMs === 1500.0 * 1000.0 / 600.0) // 2500 ms
    assert(m.nTracks == 2)
  }

  test("AVI encode → RIFF parse round-trip (µs/frame · frames, streams)") {
    val bytes = Video.encodeAvi(usPerFrame = 33333, totalFrames = 90,
      streams = 2, payload = "payload".getBytes)
    val m = Video.decode(bytes).get
    assert(m.container == "avi" && m.brand == "AVI ")
    assert(m.durationMs === 33333.0 * 90.0 / 1000.0) // ~3000 ms
    assert(m.nTracks == 2)
  }

  test("mvhd version 1 (64-bit duration) parses") {
    // Hand-build a v1 mvhd: version=1, 8-byte timestamps, u32 timescale,
    // u64 duration.
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def box(t: String, body: Array[Byte]) =
      be32(8 + body.length) ++ t.getBytes("US-ASCII") ++ body
    val mvhdBody = Array[Byte](1, 0, 0, 0) ++ // version 1 + flags
      new Array[Byte](16) ++ // creation + modification (u64 each)
      be32(1000) ++ be32(0) ++ be32(5000) // timescale, duration u64
    val bytes = box("ftyp", "isom".getBytes ++ be32(0)) ++
      box("moov", box("mvhd", mvhdBody) ++ box("trak", Array.empty[Byte]))
    val m = Video.decode(bytes).get
    assert(m.durationMs === 5000.0 * 1000.0 / 1000.0)
    assert(m.nTracks == 1)
  }

  test("malformed / non-video payloads decode to None, never throw") {
    assert(Video.decode(null).isEmpty)
    assert(Video.decode(Array.empty[Byte]).isEmpty)
    assert(Video.decode("not a video at all".getBytes).isEmpty)
    // truncated mp4: cut INSIDE moov — its declared size runs past the
    // end, so the walk aborts. (Truncation AFTER moov — e.g. a cut mdat
    // tail — is tolerated by design: the metadata was already complete,
    // same truncation-tolerance stance as the WET/WAV parsers.)
    val good = Video.encodeMp4(600, 100L, 1, Array.empty[Byte])
    assert(Video.decode(good.take(34)).isEmpty) // 24-byte ftyp + 10
    assert(Video.decode(good.take(good.length - 4)).nonEmpty) // mdat cut: ok
    // corrupted box size inside moov
    val bad = good.clone()
    bad(good.indexOfSlice("moov".getBytes) - 4 + 7) = 99.toByte // child size
    assert(Video.decode(bad).isEmpty || Video.decode(bad).nonEmpty) // no throw
  }

  test("synthetic generators match the oracle arithmetic") {
    val text = "alpha bravo " * 20 // 240 bytes
    val mp4 = Video.decode(Video.syntheticMp4(4L, text)).get
    assert(mp4.durationMs === (240L * 25L).toDouble * 1000.0 / 600.0)
    assert(mp4.nTracks == 1 + (4 % 3).toInt)
    val avi = Video.decode(Video.syntheticAvi(7L, text)).get
    assert(avi.durationMs === 33333.0 * (240 / 64).toDouble / 1000.0)
    assert(avi.nTracks == 1 + (7 % 2).toInt)
  }
}

/** Spark-side plumbing for the video metadata path. */
class VideoSparkSpec extends SparkSpec {
  import spark.implicits._

  test("decodeVideoMeta: per-row degrade on junk, real parse on containers") {
    val df = Seq(
      (1L, Video.syntheticMp4(1L, "some text here")),
      (2L, Video.syntheticAvi(2L, "other text here")),
      (3L, "garbage".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeVideoMeta(df, "payload", "doc_id")
      .collect().map(v => v.id -> v).toMap
    assert(out(1L).decoded && out(1L).container == "mp4" && out(1L).n_tracks == 2)
    assert(out(2L).decoded && out(2L).container == "avi" && out(2L).n_tracks == 1)
    assert(!out(3L).decoded)
  }
}
