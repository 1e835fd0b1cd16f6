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

  test("transform matrix: rescale/crop tolerance quantified (the docs/API.md recall envelope)") {
    // A structured 64×64 image (gradient + blob + stripes — perceptual
    // hashes are specified over structured content, not noise).
    val (w, h) = (64, 64)
    def structured(cap: Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = (x * 255 / w + y * 255 / h) / 2
          val blob =
            if (x > w / 4 && x < w / 2 && y > h / 3 && y < 2 * h / 3) 80
            else 0
          val stripe = if ((x * 5 / w) % 2 == 0) 30 else 0
          val v = math.min(cap, g + blob + stripe)
          val i = (y * w + x) * 3
          rgb(i) = v.toByte
          rgb(i + 1) = (v * 3 / 4).toByte
          rgb(i + 2) = (v / 2).toByte
          x += 1
        }
        y += 1
      }
      rgb
    }
    def rescale(rgb: Array[Byte], nw: Int, nh: Int): (Int, Int, Array[Byte]) = {
      val out = new Array[Byte](nw * nh * 3)
      for (y <- 0 until nh; x <- 0 until nw; c <- 0 until 3)
        out((y * nw + x) * 3 + c) =
          rgb(((y * h / nh) * w + (x * w / nw)) * 3 + c)
      (nw, nh, out)
    }
    def crop(rgb: Array[Byte], frac: Double): (Int, Int, Array[Byte]) = {
      val nw = (w * frac).toInt; val nh = (h * frac).toInt
      val ox = (w - nw) / 2; val oy = (h - nh) / 2
      val out = new Array[Byte](nw * nh * 3)
      for (y <- 0 until nh; x <- 0 until nw; c <- 0 until 3)
        out((y * nw + x) * 3 + c) = rgb(((y + oy) * w + (x + ox)) * 3 + c)
      (nw, nh, out)
    }
    def pd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def pOf(t: (Int, Int, Array[Byte])) = {
      val p = Dhash.decodePixels(Bmp.encode(t._1, t._2, t._3)).get
      (Phash.phash64(p.width, p.height, p.lum),
        Dhash.dhash64(p.width, p.height, p.lum))
    }
    val base = structured(255)
    val (pb, db) = pOf((w, h, base))

    // RESCALE, grid-aligned (new size a multiple/divisor of the 32×32
    // cell grid): the cell averages are IDENTICAL → pHash moves 0 bits
    for (s <- Seq(32, 96, 128)) {
      val (p, _) = pOf(rescale(base, s, s))
      assert(pd(pb, p) === 0, s"grid-aligned rescale ${s}x$s")
    }
    // RESCALE, grid-aliasing (48 is not a multiple of 32): nearest-
    // neighbor sampling shifts cell contents — pHash moves ~10 bits
    // (outside the registered maxDist=2), dHash's 9×8 grid is coarser
    // and stays at 0. Documented limitation, not a silent claim.
    val (p48, d48) = pOf(rescale(base, 48, 48))
    assert(pd(pb, p48) > 2 && pd(pb, p48) <= 16, s"aliased=${pd(pb, p48)}")
    assert(pd(db, d48) <= 2)
    // CROP: a center crop shifts every DCT phase — pHash moves ≥ 8 bits
    // even at 95% (NOT crop-tolerant; finding crops needs overlapping-
    // region search); dHash's gradient bits survive mild crops
    for (f <- Seq(0.95, 0.9)) {
      val (p, d) = pOf(crop(base, f))
      assert(pd(pb, p) >= 8, s"crop $f phash=${pd(pb, p)}")
      assert(pd(db, d) <= 6, s"crop $f dhash=${pd(db, d)}")
    }
    // heavy crops defeat both (documented envelope edge)
    val (p5, d5) = pOf(crop(base, 0.5))
    assert(pd(pb, p5) > 16 && pd(db, d5) > 16)
    // BRIGHTNESS, no clipping (cap 200 leaves +30 headroom): pHash is
    // EXACTLY invariant (the proved DC-term argument)
    val capped = structured(200)
    val (pc, _) = pOf((w, h, capped))
    val brighter = capped.map(b => ((b & 0xff) + 30).toByte)
    val (pcb, _) = pOf((w, h, brighter))
    assert(pd(pc, pcb) === 0)
  }

  test("dihedral64: exactly invariant over the full rotation/flip orbit; plain phash64 is not") {
    // Independent transforms, written from the textbook definitions —
    // NOT the engine's Dihedral table: rot90 CW and horizontal mirror
    // generate the whole 8-element group by composition, so closing the
    // orbit under them covers every engine transform arm.
    type Img = (Int, Int, Array[Byte])
    def rot90(t: Img): Img = {
      val (w, h, rgb) = t
      val out = new Array[Byte](w * h * 3)
      for (y <- 0 until w; x <- 0 until h; c <- 0 until 3)
        out((y * h + x) * 3 + c) = rgb(((h - 1 - x) * w + y) * 3 + c)
      (h, w, out)
    }
    def mirrorH(t: Img): Img = {
      val (w, h, rgb) = t
      val out = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        out((y * w + x) * 3 + c) = rgb((y * w + (w - 1 - x)) * 3 + c)
      (w, h, out)
    }
    def hashes(t: Img): (Long, Long) = {
      val p = Dhash.decodePixels(Bmp.encode(t._1, t._2, t._3)).get
      (Phash.dihedral64(p.width, p.height, p.lum),
        Phash.phash64(p.width, p.height, p.lum))
    }
    // non-square, asymmetric content so no transform is a fixed point
    for ((w, h, seed) <- Seq((40, 24, 3), (16, 5, 8), (33, 47, 21))) {
      val base: Img = (w, h, raster(w, h, seed))
      // close the orbit under the two generators
      var orbit = Map[Int, Img]() // keyed by a content digest
      def key(t: Img) = (t._1, t._2, java.util.Arrays.hashCode(t._3)).hashCode
      var frontier = List(base)
      while (frontier.nonEmpty) {
        val t = frontier.head; frontier = frontier.tail
        if (!orbit.contains(key(t))) {
          orbit += key(t) -> t
          frontier = rot90(t) :: mirrorH(t) :: frontier
        }
      }
      assert(orbit.size === 8, s"${w}x$h orbit size ${orbit.size}")
      val (canonBase, plainBase) = hashes(base)
      var plainMoved = false
      for (t <- orbit.values) {
        val (canon, plain) = hashes(t)
        assert(canon === canonBase, s"${w}x$h canonical drifted")
        if (plain != plainBase) plainMoved = true
      }
      // the gap is real: SOME orientation moves the plain fingerprint
      assert(plainMoved, s"${w}x$h plain phash survived every transform")
    }
    // distinct content still separates
    assert(hashes((40, 24, raster(40, 24, 3)))._1
      !== hashes((40, 24, raster(40, 24, 77)))._1)
  }

  test("planted rotated re-encode pairs at hamming 0 through the dihedral fingerprint") {
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val rows = (0 until 8).map { t =>
      (100L + t, Multimodal.syntheticBmpTransformed(0L, text, t))
    } :+ ((999L, Multimodal.syntheticBmp(0L, "completely different content " * 10)))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    // transform 0 reproduces the base payload bit-for-bit
    assert(java.util.Arrays.equals(
      Multimodal.syntheticBmpTransformed(0L, text, 0),
      Multimodal.syntheticBmp(0L, text)))
    val fp = Multimodal.imagePhashDihedral(df, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0 until 8).map(t => fp(100L + t)).toSet.size === 1,
      "all 8 orientations must share one canonical fingerprint")
    assert(fp(999L) !== fp(100L))
    val pairs = Multimodal.imagePhashDedupPairsDihedral(df, "payload",
      "doc_id", maxDist = 0).collect()
    // all C(8,2) orientation pairs at distance 0, nothing touching 999
    assert(pairs.length === 28)
    assert(pairs.forall(r => r.getInt(2) === 0 && r.getLong(1) < 999L))
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
