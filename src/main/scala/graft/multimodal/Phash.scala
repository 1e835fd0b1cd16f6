package graft.multimodal

/**
 * pHash — the DCT perceptual hash (pHash.org lineage; the second
 * standard image fingerprint next to [[Dhash]]): the image is reduced
 * to a 32×32 cell grid, an 8×8 block of low-frequency DCT-II
 * coefficients is taken, and each of the 63 AC coefficients is
 * thresholded against their median. Where dHash captures local
 * gradients, pHash captures the global frequency envelope — robust to
 * resizing and blur, and EXACTLY invariant to uniform brightness
 * shifts (the shift lands entirely in the excluded DC term; see below).
 *
 * Everything is exact integer arithmetic so the DuckDB oracle can
 * replay the full decode→cells→DCT→median→bits chain bit-for-bit:
 *  - cell values are `(sum·64) / count` (integer floor division — the
 *    ×64 keeps sub-luminance precision through the division);
 *  - the cosine basis is a Q10 integer table ([[T]]) shared verbatim
 *    with the oracle (emitted as SQL literals), rounded
 *    half-away-from-zero so the table keeps the basis's exact
 *    antisymmetries: for every u ≥ 1 the 32 entries cancel in pairs
 *    (odd u: x ↔ 31−x; u ≡ 2 mod 4: x ↔ x+16; u = 4: x ↔ x+8), so
 *    Σₓ T(u)(x) = 0 EXACTLY and a uniform +c luminance shift — which
 *    moves every cell value by exactly 64c — contributes
 *    64c·Σ T(u) ·Σ T(v) = 0 to every AC coefficient;
 *  - the median of the 63 AC values is the 32nd-smallest (an order
 *    statistic — no averaging), and bits use strict `>`.
 *
 * Worst-case magnitudes stay far inside int64: |cell| ≤ 765·64,
 * |row pass| ≤ 32·1024·48960 ≈ 1.6e9, |F| ≤ 32·1024·1.6e9 ≈ 5.3e13.
 */
object Phash {

  /** Cell grid edge (N×N cells feed the DCT). */
  val GridN = 32

  /** DCT block edge (low-frequency 8×8; 63 AC bits + excluded DC). */
  val BlockN = 8

  /** Q10 integer DCT-II basis: T(u)(x) = ±round(|cos(π(2x+1)u/64)|·1024)
    * (half-away-from-zero via the sign split, StrictMath for
    * platform-independent cos). Shared with the DuckDB oracle as
    * literals — the oracle's DCT is this table, not libm. */
  val T: Array[Array[Long]] = Array.tabulate(BlockN, GridN) { (u, x) =>
    val c = StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2 * GridN))
    if (c < 0) -StrictMath.round(-c * 1024) else StrictMath.round(c * 1024)
  }

  /**
   * 64-bit pHash of a luminance raster. Bit v·8+u (for (u,v) ≠ (0,0))
   * is set iff DCT coefficient F(u,v) is strictly greater than the
   * median (32nd-smallest) of the 63 AC coefficients; bit 0 (the DC
   * slot) is always 0. Cell boundaries are the same integer-division
   * scheme as [[Dhash.dhash64]] (the max(lo+1, …) guard keeps every
   * cell non-empty below grid size).
   */
  def phash64(width: Int, height: Int, lum: Array[Int]): Long = {
    require(width > 0 && height > 0 && lum.length >= width * height,
      "raster must be non-empty with w*h luminance entries")
    val n = GridN
    val cell = new Array[Long](n * n)
    var gj = 0
    while (gj < n) {
      val ylo = gj * height / n
      val yhi = math.min(height, math.max(ylo + 1, (gj + 1) * height / n))
      var gi = 0
      while (gi < n) {
        val xlo = gi * width / n
        val xhi = math.min(width, math.max(xlo + 1, (gi + 1) * width / n))
        var s = 0L; var c = 0L
        var y = ylo
        while (y < yhi) {
          var x = xlo
          while (x < xhi) { s += lum(y * width + x); c += 1; x += 1 }
          y += 1
        }
        cell(gj * n + gi) = s * 64 / c
        gi += 1
      }
      gj += 1
    }
    // Separable DCT, exact in int64: row pass then column pass (the
    // same value as the direct double sum — integer + is associative).
    val row = new Array[Long](BlockN * n) // row(u)(y) = Σx T(u)(x)·cell(y,x)
    var u = 0
    while (u < BlockN) {
      var y = 0
      while (y < n) {
        var acc = 0L
        var x = 0
        while (x < n) { acc += T(u)(x) * cell(y * n + x); x += 1 }
        row(u * n + y) = acc
        y += 1
      }
      u += 1
    }
    val f = new Array[Long](BlockN * BlockN) // f(v*8+u) = F(u,v)
    var v = 0
    while (v < BlockN) {
      var uu = 0
      while (uu < BlockN) {
        var acc = 0L
        var y = 0
        while (y < n) { acc += T(v)(y) * row(uu * n + y); y += 1 }
        f(v * BlockN + uu) = acc
        uu += 1
      }
      v += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(f, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    var k = 1
    while (k < 64) {
      if (f(k) > med) hash |= 1L << k
      k += 1
    }
    hash
  }

  /**
   * Dihedral-canonical pHash: the unsigned-64-bit minimum of [[phash64]]
   * over all 8 dihedral transforms of the raster (identity, the three
   * 90° rotations, both mirror flips, transpose, anti-transpose). A
   * rotated or mirrored copy hashes the SAME 8-element orbit — t·g runs
   * over the group as t does — and the minimum of a set is visit-order
   * independent, so the fingerprint is EXACTLY invariant under any
   * orientation edit, closing the plain pHash's documented orientation
   * gap (docs/API.md transform matrix: rotations/flips break both dHash
   * and pHash). The canonical choice (unsigned min) is the
   * lexicographic minimum of the (c3,c2,c1,c0) chunk columns, which is
   * how the signed-BIGINT DuckDB oracle replays it.
   *
   * Cost: 8 cell-grid + DCT passes per image — all far below the decode
   * the caller already paid; pairing is unchanged (banding runs on the
   * single canonical hash exactly as on [[phash64]]).
   */
  def dihedral64(width: Int, height: Int, lum: Array[Int]): Long = {
    var best = phash64(width, height, lum)
    var t = 1
    while (t < Dihedral.Count) {
      val wt = if (Dihedral.swaps(t)) height else width
      val ht = if (Dihedral.swaps(t)) width else height
      val out = new Array[Int](wt * ht)
      var y = 0
      while (y < ht) {
        var x = 0
        while (x < wt) {
          out(y * wt + x) = lum(Dihedral.srcIndex(t, width, height, x, y))
          x += 1
        }
        y += 1
      }
      val h = phash64(wt, ht, out)
      if (java.lang.Long.compareUnsigned(h, best) < 0) best = h
      t += 1
    }
    best
  }
}

/**
 * The 8 symmetries of a rectangle (the dihedral group D₄ acting on
 * rasters): 0 identity, 1 rot90 CW, 2 rot180, 3 rot270, 4 horizontal
 * mirror, 5 vertical mirror, 6 transpose, 7 anti-transpose. Shared by
 * [[Phash.dihedral64]], the transformed synthetic payloads and the
 * invariance specs so every consumer agrees on the same mapping.
 */
object Dihedral {

  val Count = 8

  /** Whether transform t swaps width and height. */
  def swaps(t: Int): Boolean = t == 1 || t == 3 || t == 6 || t == 7

  /** Row-major index INTO the original (width×height) raster of the
    * source pixel for output coordinate (x, y) of transform t — output
    * dims are (height, width) when [[swaps]], else (width, height). */
  def srcIndex(t: Int, width: Int, height: Int, x: Int, y: Int): Int = {
    val sx = t match {
      case 0 => x
      case 1 => y //               rot90 CW:   out(x,y) = in(y, h-1-x)
      case 2 => width - 1 - x //   rot180:     out(x,y) = in(w-1-x, h-1-y)
      case 3 => width - 1 - y //   rot270:     out(x,y) = in(w-1-y, x)
      case 4 => width - 1 - x //   mirror-h:   out(x,y) = in(w-1-x, y)
      case 5 => x //               mirror-v:   out(x,y) = in(x, h-1-y)
      case 6 => y //               transpose:  out(x,y) = in(y, x)
      case _ => width - 1 - y //   anti-tr:    out(x,y) = in(w-1-y, h-1-x)
    }
    val sy = t match {
      case 0 => y
      case 1 => height - 1 - x
      case 2 => height - 1 - y
      case 3 => x
      case 4 => y
      case 5 => height - 1 - y
      case 6 => x
      case _ => height - 1 - x
    }
    sy * width + sx
  }
}
