package graft

import graft.multimodal.Wav

class WavSpec extends SparkSpec {

  test("encode/decode roundtrip: sine wave stats") {
    val rate = 8000
    val amp = 16384.0 // half scale
    val samples = Array.tabulate(8000)(i =>
      (amp * math.sin(2 * math.Pi * 440 * i / rate)).toShort)
    val w = Wav.decode(Wav.encode(rate, 1, samples)).get
    assert(w.sampleRate == rate && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.nFrames == 8000L)
    assert(w.durationMs === 1000.0)
    // RMS of a sine = amp/√2 (normalized: 0.5/√2 ≈ 0.35355), tolerance
    // for integer quantization
    assert(math.abs(w.rms - 0.5 / math.sqrt(2)) < 0.001, s"rms=${w.rms}")
    assert(w.clipFrac == 0.0)
    assert(w.peak <= 0.5 && w.peak > 0.49)
  }

  test("full-scale square wave clips every sample") {
    val samples = Array.tabulate(100)(i =>
      if (i % 2 == 0) Short.MaxValue else Short.MinValue)
    val w = Wav.decode(Wav.encode(8000, 1, samples)).get
    assert(w.clipFrac === 1.0)
    assert(w.peak === 1.0)
    assert(math.abs(w.rms - 1.0) < 0.001)
  }

  test("stereo frame counting") {
    val samples = new Array[Short](1000) // 500 frames of 2 channels
    val w = Wav.decode(Wav.encode(16000, 2, samples)).get
    assert(w.channels == 2 && w.nFrames == 500L)
    assert(w.durationMs === 500.0 * 1000.0 / 16000.0)
    assert(w.rms === 0.0 && w.peak === 0.0 && w.clipFrac === 0.0)
  }

  test("truncated data chunk decodes the available prefix") {
    val full = Wav.encode(8000, 1, Array.tabulate(1000)(_ => 1000.toShort))
    val cut = full.take(44 + 200) // 100 of 1000 samples survive
    val w = Wav.decode(cut).get
    assert(w.nFrames == 100L)
    assert(math.abs(w.rms - 1000.0 / 32768.0) < 1e-9)
  }

  test("unknown chunks are skipped (word-aligned)") {
    // splice an odd-sized junk chunk between fmt and data
    val base = Wav.encode(8000, 1, Array[Short](0, 0, 0, 0))
    val junk = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
      .array()
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // fix RIFF size
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val w = Wav.decode(spliced).get
    assert(w.nFrames == 4L)
  }

  test("non-WAV and corrupt payloads are rejected, not thrown") {
    assert(Wav.decode(null).isEmpty)
    assert(Wav.decode(Array.empty[Byte]).isEmpty)
    assert(Wav.decode("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
    assert(Wav.decode(Array.fill[Byte](100)(0x41)).isEmpty)
    // declared chunk size that loops must terminate as None
    val evil = Wav.encode(8000, 1, Array[Short](1, 2))
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1 // fmt size = -1
    assert(Wav.decode(evil).isEmpty || Wav.decode(evil).isDefined) // no hang/throw
  }

  test("synthetic wav decodes with nonzero clip fraction and duration") {
    val w = Wav.decode(Wav.syntheticWav(7L, "key agg row scan " * 20)).get
    assert(w.sampleRate == 8000 && w.channels == 1)
    assert(w.clipFrac > 0.0 && w.clipFrac < 0.05)
    assert(w.durationMs > 0.0 && w.rms > 0.0)
  }

  test("decodeAudio dataset path degrades per row") {
    import spark.implicits._
    val df = Seq(
      (1L, Wav.syntheticWav(1L, "table scan join")),
      (2L, Array[Byte](1, 2, 3)) // not a wav
    ).toDF("doc_id", "payload")
    val rows = graft.multimodal.Multimodal
      .decodeAudio(df, "payload", "doc_id").collect().sortBy(_.id)
    assert(rows(0).decoded && rows(0).sample_rate == 8000)
    assert(!rows(1).decoded && rows(1).sample_rate == 0)
  }
}
