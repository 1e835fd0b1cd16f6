package graft

import graft.multimodal.{AudioFingerprint, Multimodal, Wav}

/** Audio envelope fingerprints: kernel exactness, gain invariance, and
  * the planted-duplicate pairing guarantee through the shared wide-key
  * Hamming banding. */
class AudioFingerprintSpec extends SparkSpec {

  /** Deterministic test clip: two-tone square-ish wave with a seed-driven
    * envelope, n samples. */
  private def clip(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n) { i =>
      val period = if ((i / 200) % 2 == 0) 8 else 24
      val amp = 3000 + 200 * ((i / 100 + seed) % 7)
      if ((i / period) % 2 == 0) amp else -amp
    }

  test("fingerprint64: deterministic; empty clip has no fingerprint") {
    val c = clip(1600, 1)
    assert(AudioFingerprint.fingerprint64(c) === AudioFingerprint.fingerprint64(c))
    assert(AudioFingerprint.fingerprint64(Array.empty[Int]).isEmpty)
    // distinct envelopes produce distinct fingerprints
    assert(AudioFingerprint.fingerprint64(clip(1600, 1)).get !==
      AudioFingerprint.fingerprint64(clip(1600, 9)).get)
  }

  test("fingerprint64: gain-invariant (volume-scaled copy hashes identically)") {
    val c = clip(1600, 3)
    val louder = c.map(_ * 3)
    val quieter = c.map(_ / 2)
    val fp = AudioFingerprint.fingerprint64(c).get
    assert(AudioFingerprint.fingerprint64(louder).get === fp)
    // integer halving can flip comparisons near ties; energy envelope
    // ordering survives a uniform /2 on this clip
    assert(AudioFingerprint.fingerprint64(quieter).get === fp)
  }

  test("fingerprint64: tiny clips (fewer samples than frames) are defined") {
    for (n <- Seq(1, 2, 8, 32)) {
      val c = clip(n, 2)
      val fp = AudioFingerprint.fingerprint64(c)
      assert(fp.isDefined)
      assert(fp === AudioFingerprint.fingerprint64(c))
    }
  }

  test("near-dup: a short dropout moves few bits; planted pair is found") {
    val base = clip(3300, 5)
    // dropout: zero 40 samples inside ONE frame (3300/33 = 100/frame)
    val edited = base.clone()
    for (i <- 150 until 190) edited(i) = 0
    val hBase = AudioFingerprint.fingerprint64(base).get
    val hEdit = AudioFingerprint.fingerprint64(edited).get
    val hamming = java.lang.Long.bitCount(hBase ^ hEdit)
    assert(hamming > 0 && hamming <= 2, s"dropout moved $hamming bits")

    val rows = Seq(
      (1L, Wav.encode(8000, 1, base.map(_.toShort))),
      (2L, Wav.encode(8000, 1, edited.map(_.toShort))),
      (3L, Wav.encode(8000, 1, clip(3300, 11).map(_.toShort))))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val pairs = Multimodal.audioDedupPairs(df, "payload", "doc_id",
      maxDist = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Int]("hamming") === hamming)
  }

  test("identical payloads pair at hamming 0; non-wav rows drop out") {
    val wav = Wav.encode(8000, 1, clip(800, 4).map(_.toShort))
    val rows = Seq((10L, wav), (20L, wav), (30L, Array[Byte](1, 2, 3, 4)))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val fps = Multimodal.audioFingerprint(df, "payload", "doc_id").collect()
    assert(fps.map(_.getLong(0)).toSet === Set(10L, 20L))
    val pairs = Multimodal.audioDedupPairs(df, "payload", "doc_id",
      maxDist = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      === Set((10L, 20L, 0)))
  }

  test("windowedFingerprints: shift by a hop multiple reproduces the original's windows") {
    val base = clip(640, 6)
    val shifted = Array.fill(128)(0) ++ base // 128 = 2 hops at hop 64
    val fb = AudioFingerprint.windowedFingerprints(base, 256, 64).toMap
    val fs = AudioFingerprint.windowedFingerprints(shifted, 256, 64).toMap
    // window k of the original IS window k+2 of the shifted copy
    (0 to (640 - 256) / 64).foreach { k =>
      assert(fs(k + 2) === fb(k), s"window $k")
    }
    // short clips: single whole-clip fingerprint at index 0
    val tiny = AudioFingerprint.windowedFingerprints(clip(100, 1), 256, 64)
    assert(tiny.map(_._1) === Seq(0))
    assert(tiny.head._2 === AudioFingerprint.fingerprint64(clip(100, 1)).get)
    // hop > window/2 is rejected (no shift-tolerance guarantee)
    intercept[IllegalArgumentException] {
      AudioFingerprint.windowedFingerprints(base, 256, 200)
    }
  }

  test("planted time-shifted duplicate: found by windowed matching, missed by the whole-clip hash") {
    val base = clip(800, 7)
    val shifted = Array.fill(32)(0) ++ base // 2 hops at the demo hop 16
    // clip 3 is hash-noise, not another square wave — the coarse
    // 33-frame envelope over 64-sample windows can genuinely collide
    // for two structurally similar synthetic tones
    val noise = Array.tabulate(800)(i =>
      (((i * 2654435761L + 11) % 7919) - 3959).toInt)
    val rows = Seq(
      (1L, Wav.encode(8000, 1, base.map(_.toShort))),
      (2L, Wav.encode(8000, 1, shifted.map(_.toShort))),
      (3L, Wav.encode(8000, 1, noise.map(_.toShort))))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    // the positional whole-clip envelope hash does NOT see the pair
    val whole = Multimodal.audioDedupPairs(df, "payload", "doc_id",
      maxDist = 2).collect()
    assert(!whole.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"whole-clip hash unexpectedly matched the shifted pair: ${whole.toSeq}")
    // the windowed fingerprints DO — at Hamming 0 (shared windows are
    // sample-identical)
    val win = Multimodal.audioDedupPairsShifted(df, "payload", "doc_id",
      maxDist = 2, window = 64, hop = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(win.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      s"windowed matching missed the planted shift: ${win.toSeq}")
    // the unrelated clip stays unpaired with the base clip
    assert(!win.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0))
  }

  test("aligned dedup: non-hop-multiple delay and 8-bit re-encode both caught; hop-granular path misses the offset") {
    import graft.multimodal.{AudioFingerprint, Multimodal, Wav}
    // well-mixed pseudorandom noise: unlike smooth/periodic tones
    // (whose coarse envelopes self-collide across windows), every
    // window is globally distinguishable, so the +5 offset genuinely
    // defeats hop-granular matching
    def mix(i: Int): Int = {
      var x = i * 0x9E3779B1
      x ^= x >>> 16
      x *= 0x85EBCA77
      x ^= x >>> 13
      math.floorMod(x, 8000) - 4000
    }
    val base = Array.tabulate(900)(mix)
    val delayed5 = Array.fill(5)(0) ++ base // NON-multiple of hop 16
    val re8 = base.map(s => (s >> 8) << 8) // 16→8-bit floor re-encode
    val rows = Seq(
      (1L, Wav.encode(8000, 1, base.map(_.toShort))),
      (2L, Wav.encode(8000, 1, delayed5.map(_.toShort))),
      (3L, Wav.encode(8000, 1, re8.map(_.toShort))))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    // the hop-granular windowed path cannot catch a +5-sample offset
    // (windows only reproduce under hop-multiple delays)
    val hopOnly = Multimodal.audioDedupPairsShifted(df, "payload",
      "doc_id", maxDist = 2, window = 64, hop = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!hopOnly.contains((1L, 2L)),
      s"hop-granular path unexpectedly matched the +5 offset: ${hopOnly.toSeq}")
    // the silence-trimmed path catches BOTH planted dupes
    val aligned = Multimodal.audioDedupPairsAligned(df, "payload",
      "doc_id", maxDist = 2, window = 64, hop = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(aligned.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      s"aligned path missed the +5-sample delay: ${aligned.toSeq}")
    assert(aligned.exists(p => p._1 == 1L && p._2 == 3L && p._3 <= 2),
      s"aligned path missed the 8-bit re-encode: ${aligned.toSeq}")
    // trim is exact: leading/trailing near-silence stripped, interior kept
    val trimmed = AudioFingerprint.trimSilence(
      Array(0, 10, -255, 4000, 0, -4000, 255, 0), eps = 255)
    assert(trimmed.toSeq === Seq(4000, 0, -4000))
    assert(AudioFingerprint.trimSilence(Array(1, 2, 3), 255).isEmpty)
  }

  test("decodeSamples: round-trips the encoder, sign-extends, tolerates truncation") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 5, -5)
    val wav = Wav.encode(8000, 1, samples)
    val got = Wav.decodeSamples(wav).get
    assert(got.sampleRate === 8000 && got.channels === 1 && got.bits === 16)
    assert(got.samples.toSeq === samples.map(_.toInt).toSeq)
    // truncated payload decodes its available prefix
    val cut = Wav.decodeSamples(wav.take(44 + 6)).get
    assert(cut.samples.toSeq === Seq(0, 100, -100))
    assert(Wav.decodeSamples("RIFFjunk".getBytes).isEmpty)
  }
}
