package graft

import graft.multimodal.{Bmp, Dhash, Multimodal, Phash}

/** DCT perceptual hash: kernel exactness, the provable
  * brightness-shift invariance, median-threshold structure, and the
  * planted-near-dup pairing guarantee through the shared banding. */
class PhashSpec extends SparkSpec {

  /** Deterministic w×h RGB raster with channel values bounded to
    * [0, 200] so brightness-shift tests have headroom. */
  private def raster(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = (((i * 7 + seed * 13) % 191 + i / 3) % 200).toByte
      i += 1
    }
    rgb
  }

  private def hashOf(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val p = Dhash.decodePixels(Bmp.encode(w, h, rgb)).get
    Phash.phash64(p.width, p.height, p.lum)
  }

  test("phash64: deterministic, DC bit clear, at most 31 bits set") {
    for (seed <- Seq(1, 5, 9, 42)) {
      val hash = hashOf(40, 40, raster(40, 40, seed))
      assert(hash === hashOf(40, 40, raster(40, 40, seed)))
      assert((hash & 1L) === 0L, "DC slot must stay 0")
      // strict > against the 32nd-smallest of 63: at most 31 exceed it
      assert(java.lang.Long.bitCount(hash) <= 31)
    }
    assert(hashOf(40, 40, raster(40, 40, 1)) !== hashOf(40, 40, raster(40, 40, 9)))
  }

  test("cosine table rows u >= 1 sum to exactly zero (the invariance basis)") {
    for (u <- 1 until Phash.BlockN)
      assert(Phash.T(u).sum === 0L, s"row $u")
    assert(Phash.T(0).forall(_ === 1024L))
  }

  test("uniform brightness shift leaves the hash EXACTLY unchanged") {
    for ((w, h, seed) <- Seq((40, 40, 3), (17, 23, 8), (64, 32, 21))) {
      val base = raster(w, h, seed)
      val brighter = base.map(b => (b + 20).toByte) // headroom by construction
      assert(hashOf(w, h, base) === hashOf(w, h, brighter),
        s"${w}x$h seed $seed")
    }
  }

  test("phash64: tiny rasters (below the 32x32 grid) are defined") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 1), (4, 12))) {
      val hash = hashOf(w, h, raster(w, h, 5))
      assert(hash === hashOf(w, h, raster(w, h, 5)))
      // a constant-ish 1×1 image has all-equal cells: every AC
      // coefficient is 0 → nothing exceeds the median → hash 0
      if (w == 1 && h == 1) assert(hash === 0L)
    }
  }

  test("near-dup: a small pixel edit moves few bits; planted pair is found") {
    val base = raster(48, 48, 3)
    val edited = base.clone()
    var p = 0
    while (p < 12) { edited(p * 3) = (edited(p * 3) + 8).toByte; p += 1 }
    val hBase = hashOf(48, 48, base)
    val hEdit = hashOf(48, 48, edited)
    val hamming = java.lang.Long.bitCount(hBase ^ hEdit)
    assert(hamming <= 2, s"small edit moved $hamming bits")

    val rows = Seq(
      (1L, Bmp.encode(48, 48, base)),
      (2L, Bmp.encode(48, 48, edited)),
      (3L, Bmp.encode(48, 48, raster(48, 48, 77))))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val pairs = Multimodal.imagePhashDedupPairs(df, "payload", "doc_id",
      maxDist = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Int]("hamming") === hamming)
  }

  test("separable kernel equals an independent direct-sum reference") {
    // Reference implementation, written independently of Phash.phash64:
    // cells via the same integer-boundary scheme, then the DIRECT
    // 4-nested DCT sum, median as the sorted 32nd element — any
    // restructuring bug in the separable two-pass form shows up here.
    def reference(width: Int, height: Int, lum: Array[Int]): Long = {
      val n = Phash.GridN
      val cell = Array.tabulate(n, n) { (gj, gi) =>
        val ylo = gj * height / n
        val yhi = math.min(height, math.max(ylo + 1, (gj + 1) * height / n))
        val xlo = gi * width / n
        val xhi = math.min(width, math.max(xlo + 1, (gi + 1) * width / n))
        var s = 0L; var c = 0L
        for (y <- ylo until yhi; x <- xlo until xhi) {
          s += lum(y * width + x); c += 1
        }
        s * 64 / c
      }
      val f = Array.tabulate(Phash.BlockN, Phash.BlockN) { (u, v) =>
        var acc = 0L
        for (x <- 0 until n; y <- 0 until n)
          acc += Phash.T(u)(x) * Phash.T(v)(y) * cell(y)(x)
        acc
      }
      val ac = (for (v <- 0 until 8; u <- 0 until 8; if v * 8 + u != 0)
        yield f(u)(v)).sorted
      val med = ac(31)
      (for (v <- 0 until 8; u <- 0 until 8; if v * 8 + u != 0 && f(u)(v) > med)
        yield 1L << (v * 8 + u)).foldLeft(0L)(_ | _)
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val w = 1 + rnd.nextInt(70)
      val h = 1 + rnd.nextInt(70)
      val lum = Array.fill(w * h)(rnd.nextInt(766))
      assert(Phash.phash64(w, h, lum) === reference(w, h, lum),
        s"trial $trial ${w}x$h")
    }
  }

  test("undecodable rows drop out; identical payloads pair at hamming 0") {
    val img = Bmp.encode(16, 8, raster(16, 8, 11))
    val rows = Seq((10L, img), (20L, img), (30L, Array[Byte](9, 9, 9)))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val fp = Multimodal.imagePhash(df, "payload", "doc_id").collect()
    assert(fp.map(_.getLong(0)).toSet === Set(10L, 20L))
    val pairs = Multimodal.imagePhashDedupPairs(df, "payload", "doc_id",
      maxDist = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      === Set((10L, 20L, 0)))
  }
}
