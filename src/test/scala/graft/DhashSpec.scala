package graft

import graft.multimodal.{Bmp, Dhash, Multimodal, Ppm}
import org.apache.spark.sql.functions._

/** Perceptual image dedup: dHash kernel exactness, codec-independent
  * fingerprints, and the planted-near-dup pairing guarantee through the
  * shared wide-key Hamming banding. */
class DhashSpec extends SparkSpec {

  /** Deterministic w×h RGB raster: smooth gradient + seed perturbation. */
  private def raster(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = (((i * 7 + seed * 13) % 251 + i / 3) % 256).toByte
      i += 1
    }
    rgb
  }

  /** Flip a small pixel region (the "re-encoded with a small edit"
    * near-dup): bump one channel of `k` pixels by +8. */
  private def perturb(rgb: Array[Byte], k: Int): Array[Byte] = {
    val out = rgb.clone()
    var p = 0
    while (p < k && p * 3 < out.length) {
      out(p * 3) = (out(p * 3) + 8).toByte
      p += 1
    }
    out
  }

  test("dhash64: deterministic, 64-bit, distinct for distinct gradients") {
    val a = Dhash.decodePixels(Bmp.encode(32, 32, raster(32, 32, 1))).get
    val b = Dhash.decodePixels(Bmp.encode(32, 32, raster(32, 32, 99))).get
    val ha = Dhash.dhash64(a.width, a.height, a.lum)
    assert(ha === Dhash.dhash64(a.width, a.height, a.lum))
    // different content should generally move at least one gradient bit
    assert(ha !== Dhash.dhash64(b.width, b.height, b.lum))
  }

  test("dhash64: tiny rasters (smaller than the 9x8 grid) are defined") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 1), (4, 12))) {
      val p = Dhash.decodePixels(Bmp.encode(w, h, raster(w, h, 5))).get
      val hash = Dhash.dhash64(p.width, p.height, p.lum)
      // 1×1 has no gradient anywhere: all comparisons tie → 0
      if (w == 1 && h == 1) assert(hash === 0L)
      else assert(hash === Dhash.dhash64(p.width, p.height, p.lum))
    }
  }

  test("decodePixels: BMP, PPM and PNG of the same raster hash identically") {
    val rgb = raster(24, 16, 7)
    val viaBmp = Dhash.decodePixels(Bmp.encode(24, 16, rgb)).get
    val viaPpm = Dhash.decodePixels(Ppm.encode(24, 16, rgb)).get
    assert(viaBmp.width === 24 && viaBmp.height === 16)
    assert(viaBmp.lum.toSeq === viaPpm.lum.toSeq)
    // PNG via the JDK writer (lossless) must agree bit-for-bit too
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24) {
      val p = (y * 24 + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) |
        (rgb(p + 2) & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val viaPng = Dhash.decodePixels(out.toByteArray).get
    assert(viaPng.lum.toSeq === viaBmp.lum.toSeq)
  }

  test("decodePixels: undecodable payloads yield no fingerprint") {
    assert(Dhash.decodePixels(null).isEmpty)
    assert(Dhash.decodePixels(Array[Byte](1, 2, 3)).isEmpty)
    assert(Dhash.decodePixels("not an image".getBytes).isEmpty)
  }

  test("near-dup: a small pixel edit moves few bits; planted pair is found") {
    val base = raster(48, 48, 3)
    val hBase = {
      val p = Dhash.decodePixels(Bmp.encode(48, 48, base)).get
      Dhash.dhash64(p.width, p.height, p.lum)
    }
    val hEdit = {
      val p = Dhash.decodePixels(Bmp.encode(48, 48, perturb(base, 12))).get
      Dhash.dhash64(p.width, p.height, p.lum)
    }
    val hamming = java.lang.Long.bitCount(hBase ^ hEdit)
    assert(hamming <= 2, s"small edit moved $hamming bits")

    // plant: base (id 1), near-dup (id 2), unrelated (id 3)
    val rows = Seq(
      (1L, Bmp.encode(48, 48, base)),
      (2L, Bmp.encode(48, 48, perturb(base, 12))),
      (3L, Bmp.encode(48, 48, raster(48, 48, 77))))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val pairs = Multimodal.imageDedupPairs(df, "payload", "doc_id",
      maxDist = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Int]("hamming") === hamming)
  }

  test("identical payloads pair at hamming 0; undecodable rows drop out") {
    val img = Bmp.encode(16, 8, raster(16, 8, 11))
    val rows = Seq((10L, img), (20L, img), (30L, Array[Byte](9, 9, 9)))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val fp = Multimodal.imageDhash(df, "payload", "doc_id").collect()
    assert(fp.map(_.getLong(0)).toSet === Set(10L, 20L))
    val pairs = Multimodal.imageDedupPairs(df, "payload", "doc_id",
      maxDist = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      === Set((10L, 20L, 0)))
  }

  test("fingerprint kernel expressions equal the typed operators; SQL-callable") {
    import org.apache.spark.sql.functions.col
    import graft.functions.GraftFunctions
    val wav = graft.multimodal.Wav.encode(8000, 1,
      Array.tabulate(800)(i => (((i * 37) % 4001) - 2000).toShort))
    val rows = Seq(
      (1L, Bmp.encode(32, 24, raster(32, 24, 5))),
      (2L, wav),
      (3L, Array[Byte](9, 9, 9)))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    def exprMap(c: org.apache.spark.sql.Column): Map[Long, Option[Long]] =
      df.select(col("doc_id"), c.as("h")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val dh = exprMap(GraftFunctions.image_dhash64(col("payload")))
    val ph = exprMap(GraftFunctions.image_phash64(col("payload")))
    val af = exprMap(GraftFunctions.audio_fingerprint64(col("payload")))
    // typed operators emit no row for undecodable payloads; the
    // expressions emit NULL — same information, SQL-shaped
    val opDh = Multimodal.imageDhash(df, "payload", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val opPh = Multimodal.imagePhash(df, "payload", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val opAf = Multimodal.audioFingerprint(df, "payload", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dh(1L) === Some(opDh(1L)) && dh(3L) === None)
    assert(ph(1L) === Some(opPh(1L)) && ph(3L) === None)
    assert(af(2L) === Some(opAf(2L)) && af(3L) === None)
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("fp_payloads")
    val viaSql = spark.sql(
      "SELECT doc_id, image_dhash64(payload) AS h FROM fp_payloads ORDER BY doc_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaSql === dh)
  }

  test("wide-key banding at 16-bit chunks matches brute force on a cloud of hashes") {
    // 40 fingerprints around two anchors with random-ish few-bit flips
    val rnd = new scala.util.Random(42)
    val anchors = Seq(0x0123456789abcdefL, 0x7edcba9876543210L)
    val hashes = (0 until 40).map { i =>
      val base = anchors(i % 2)
      var h = base
      val flips = rnd.nextInt(4)
      for (_ <- 0 until flips) h ^= 1L << rnd.nextInt(64)
      (i.toLong, h)
    }
    val df = spark.createDataFrame(hashes).toDF("doc_id", "dhash")
    for (maxDist <- Seq(0, 1, 2, 3)) {
      val got = graft.dedup.TextDedup.hammingPairsWide(df, "doc_id", "dhash",
        maxDist, chunkBits = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      assert(got === want, s"maxDist=$maxDist")
    }
  }
}
