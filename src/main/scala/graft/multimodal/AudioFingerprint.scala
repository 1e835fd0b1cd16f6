package graft.multimodal

/**
 * Perceptual audio fingerprint for multimodal dedup — the audio sibling
 * of [[Dhash]]: a 64-bit banded envelope hash in the chromaprint
 * tradition (Chromaprint/AcoustID derives band-energy gradient bits
 * from overlapping FFT frames; with no FFT library in this container,
 * the two cheap time-domain stand-ins for spectral band energy are the
 * frame ENERGY envelope and the frame ZERO-CROSSING rate — the classic
 * pre-FFT proxy for dominant frequency).
 *
 * The clip is split into 33 integer-boundary frames (same boundary
 * arithmetic as [[Dhash]]'s cells, frames never empty). Bits 0..31
 * record whether mean energy RISES from frame f to f+1; bits 32..63
 * record whether mean zero-crossing rate rises. Both comparisons are
 * gain-invariant (a volume-scaled copy compares identically) and EXACT:
 * integer sums cross-multiplied in 128-bit (BigInt here, HUGEINT in the
 * DuckDB oracle), no floats, no ties ambiguity.
 *
 * Pairing reuses [[graft.dedup.TextDedup.hammingPairsWide]] at 16-bit
 * chunks, like image dHash.
 */
object AudioFingerprint {

  /** 33 frames → 32 adjacent transitions × 2 signals = 64 bits. */
  val Frames = 33

  /**
   * 64-bit envelope fingerprint of an integer PCM sample array; None
   * for empty clips (no fingerprint row, like undecodable images).
   * Frame f covers samples [f·n/F, max(f·n/F+1, (f+1)·n/F)) (integer
   * division, clamped to n — overlapping when n < F, never empty).
   * Energy is Σs², zero-crossings count sign flips against the
   * PREVIOUS GLOBAL sample (so frame boundaries don't hide a flip).
   */
  def fingerprint64(samples: Array[Int]): Option[Long] = {
    val n = samples.length
    if (n == 0) return None
    val e = new Array[Long](Frames)
    val z = new Array[Long](Frames)
    val c = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      val lo = (f.toLong * n / Frames).toInt
      val hi = math.min(n, math.max(lo + 1,
        ((f + 1).toLong * n / Frames).toInt))
      var i = lo
      var ef = 0L; var zf = 0L
      while (i < hi) {
        val s = samples(i)
        ef += s.toLong * s
        if (i >= 1 && (s < 0) != (samples(i - 1) < 0)) zf += 1
        i += 1
      }
      e(f) = ef; z(f) = zf; c(f) = hi - lo
      f += 1
    }
    var hash = 0L
    var k = 0
    while (k < Frames - 1) {
      // mean comparisons, exact via 128-bit cross multiplication
      if (BigInt(e(k + 1)) * c(k) > BigInt(e(k)) * c(k + 1))
        hash |= 1L << k
      if (BigInt(z(k + 1)) * c(k) > BigInt(z(k)) * c(k + 1))
        hash |= 1L << (32 + k)
      k += 1
    }
    Some(hash)
  }

  /**
   * SHIFT-TOLERANT fingerprinting: [[fingerprint64]] of every
   * overlapping `window`-sample excerpt at `hop`-sample stride — the
   * real-pipeline formulation (Chromaprint/AcoustID fingerprint
   * overlapping offsets for exactly this reason): the whole-clip
   * envelope hash only matches POSITIONALLY aligned duplicates, so a
   * copy delayed by a silence prefix or trimmed intro never collides.
   * With `hop ≤ window/2` (required), a duplicate shifted by any
   * multiple of `hop` reproduces entire windows of the original
   * sample-for-sample — Hamming-0 collisions regardless of offset.
   *
   * Each window is fingerprinted as its own clip (zero-crossing counts
   * are window-local — both copies of a shared excerpt see the same
   * slice, so equality is exact). Clips shorter than `window` emit one
   * whole-clip fingerprint at index 0. Output: (windowIndex, fp) pairs;
   * rows per clip = ⌊(n−window)/hop⌋+1 — linear in clip length, the
   * standard fingerprint-density trade.
   */
  /**
   * Strip leading and trailing near-silence (|s| ≤ eps) — the
   * alignment-free normalization that closes [[windowedFingerprints]]'
   * hop-granularity gap: windows only reproduce under hop-MULTIPLE
   * delays, but a copy padded with (or trimmed of) silence reduces to
   * the same trimmed signal for ANY delay amount, so every window
   * collides at Hamming 0. `eps = 255` additionally tolerates one
   * 16→8-bit quantization step, so a re-encoded copy (amplitudes
   * floored to 256-multiples) trims at the same boundaries as the
   * original whenever the first/last audible sample exceeds the step —
   * a sample INSIDE (255, 512) can still round across the eps
   * boundary, the usual epsilon-trim caveat, documented rather than
   * hidden.
   */
  def trimSilence(samples: Array[Int], eps: Int): Array[Int] = {
    require(eps >= 0, s"silence epsilon must be non-negative, got $eps")
    var i = 0
    var j = samples.length
    while (i < j && math.abs(samples(i)) <= eps) i += 1
    while (j > i && math.abs(samples(j - 1)) <= eps) j -= 1
    if (i == 0 && j == samples.length) samples
    else java.util.Arrays.copyOfRange(samples, i, j)
  }

  def windowedFingerprints(samples: Array[Int], window: Int,
      hop: Int): Seq[(Int, Long)] = {
    require(window > 0 && hop > 0 && hop * 2 <= window,
      s"need 0 < hop <= window/2 for shift tolerance (window=$window, hop=$hop)")
    val n = samples.length
    if (n == 0) Nil
    else if (n < window) fingerprint64(samples).map((0, _)).toSeq
    else (0 to (n - window) / hop).flatMap { k =>
      val slice = java.util.Arrays.copyOfRange(
        samples, k * hop, k * hop + window)
      fingerprint64(slice).map((k, _))
    }
  }
}
