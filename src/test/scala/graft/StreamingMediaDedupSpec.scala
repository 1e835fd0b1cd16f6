package graft

import graft.multimodal.{Bmp, Wav}
import graft.streaming.StreamingMediaDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming multimodal dedup: growing fingerprint index, near-dup
  * drops across batches, exactly-once commit windows, passthroughs. */
class StreamingMediaDedupSpec extends SparkSpec {

  private def raster(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = (((i * 7 + seed * 13) % 251 + i / 3) % 256).toByte
      i += 1
    }
    rgb
  }

  private def img(seed: Int): Array[Byte] = Bmp.encode(48, 48, raster(48, 48, seed))

  private def perturbed(seed: Int): Array[Byte] = {
    val rgb = raster(48, 48, seed)
    var p = 0
    while (p < 12) { rgb(p * 3) = (rgb(p * 3) + 8).toByte; p += 1 }
    Bmp.encode(48, 48, rgb)
  }

  test("near-dups of earlier batches drop; novel and undecodable assets survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadedup").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    // batch 0: base image + one undecodable payload
    val b0 = Seq((1L, img(3)), (5L, Array[Byte](9, 9, 9)))
      .toDF("doc_id", "payload")
    StreamingMediaDedup.processBatch(b0, 0L, "payload", "doc_id",
      indexDir, outDir)
    // batch 1: near-dup of batch 0's image (dropped), an exact copy
    // (dropped), a novel image (kept), another undecodable (kept)
    val b1 = Seq((10L, perturbed(3)), (11L, img(3)), (12L, img(77)),
      (13L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    StreamingMediaDedup.processBatch(b1, 1L, "payload", "doc_id",
      indexDir, outDir)
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 5L, 12L, 13L),
      s"expected near-dup 10 and exact copy 11 dropped, got $out")
    // index holds only fingerprinted keepers (1, 12), not passthroughs
    val idx = spark.read.parquet(indexDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(idx === Seq(1L, 12L))
  }

  test("batch-internal exact duplicates keep the min id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadedup2").toString
    val b = Seq((7L, img(1)), (3L, img(1)), (9L, img(2)))
      .toDF("doc_id", "payload")
    StreamingMediaDedup.processBatch(b, 0L, "payload", "doc_id",
      s"$dir/index", s"$dir/out")
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(3L, 9L))
  }

  test("AudioWindowed: time-shifted copies of stored history drop; the positional kind misses them") {
    import spark.implicits._
    import graft.streaming.StreamingMediaDedup.{AudioEnvelope, AudioWindowed}
    def clip(n: Int, seed: Int): Array[Int] = Array.tabulate(n) { i =>
      val period = if ((i / 200) % 2 == 0) 8 else 24
      val amp = 3000 + 200 * ((i / 100 + seed) % 7)
      if ((i / period) % 2 == 0) amp else -amp
    }
    def wav(s: Array[Int]): Array[Byte] =
      Wav.encode(8000, 1, s.map(_.toShort))
    val base = clip(800, 7)
    val shifted = Array.fill(32)(0) ++ base // 2 hops at hop 16
    val noise = Array.tabulate(800)(i =>
      (((i * 2654435761L + 11) % 7919) - 3959).toInt)

    // windowed kind: the shifted copy in a LATER batch drops
    val dir1 = java.nio.file.Files.createTempDirectory("awin1").toString
    StreamingMediaDedup.processBatch(
      Seq((1L, wav(base))).toDF("doc_id", "payload"), 0L, "payload",
      "doc_id", s"$dir1/index", s"$dir1/out", AudioWindowed())
    StreamingMediaDedup.processBatch(
      Seq((2L, wav(shifted)), (3L, wav(noise))).toDF("doc_id", "payload"),
      1L, "payload", "doc_id", s"$dir1/index", s"$dir1/out", AudioWindowed())
    val out1 = spark.read.parquet(s"$dir1/out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out1 === Seq(1L, 3L), s"shifted copy not dropped: $out1")

    // the positional whole-clip kind MISSES the same shifted copy
    val dir2 = java.nio.file.Files.createTempDirectory("awin2").toString
    StreamingMediaDedup.processBatch(
      Seq((1L, wav(base))).toDF("doc_id", "payload"), 0L, "payload",
      "doc_id", s"$dir2/index", s"$dir2/out", AudioEnvelope)
    StreamingMediaDedup.processBatch(
      Seq((2L, wav(shifted))).toDF("doc_id", "payload"),
      1L, "payload", "doc_id", s"$dir2/index", s"$dir2/out", AudioEnvelope)
    val out2 = spark.read.parquet(s"$dir2/out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out2 === Seq(1L, 2L))

    // batch-INTERNAL shifted copy also drops with the windowed kind
    // (the multi-fingerprint ownership rule: doc 12 shares windows
    // owned by doc 11 even though it owns its unique lead-in windows)
    val dir3 = java.nio.file.Files.createTempDirectory("awin3").toString
    StreamingMediaDedup.processBatch(
      Seq((11L, wav(base)), (12L, wav(shifted))).toDF("doc_id", "payload"),
      0L, "payload", "doc_id", s"$dir3/index", s"$dir3/out", AudioWindowed())
    val out3 = spark.read.parquet(s"$dir3/out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out3 === Seq(11L))
    // replay stays exactly-once: the windowed index self-matches
    StreamingMediaDedup.processBatch(
      Seq((11L, wav(base)), (12L, wav(shifted))).toDF("doc_id", "payload"),
      0L, "payload", "doc_id", s"$dir3/index", s"$dir3/out", AudioWindowed())
    assert(spark.read.parquet(s"$dir3/out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(11L))
  }

  test("half-commit replay is idempotent (index lost, corpus kept)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadedup3").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val batch = Seq((1L, img(4)), (2L, img(44))).toDF("doc_id", "payload")
    StreamingMediaDedup.processBatch(batch, 0L, "payload", "doc_id",
      indexDir, outDir)
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    deleteRec(java.nio.file.Paths.get(indexDir))
    StreamingMediaDedup.processBatch(batch, 0L, "payload", "doc_id",
      indexDir, outDir)
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 2L), s"corpus duplicated on replay: $out")
    assert(spark.read.parquet(indexDir).count() === 2)
  }

  test("replay after compaction self-matches at hamming 0 — no duplication") {
    import graft.streaming.GrowingIndex
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadedup6").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val b0 = Seq((1L, img(4))).toDF("doc_id", "payload")
    val b1 = Seq((2L, img(44)), (3L, img(45))).toDF("doc_id", "payload")
    StreamingMediaDedup.processBatch(b0, 0L, "payload", "doc_id",
      indexDir, outDir)
    StreamingMediaDedup.processBatch(b1, 1L, "payload", "doc_id",
      indexDir, outDir)
    GrowingIndex.compact(spark, outDir, indexDir, targetFiles = 2)
    // the crash-window replay of an already-folded batch: its rows
    // find their own fingerprints under batch_id=-1 (exact match,
    // hamming 0), survivors are empty, the overwrite touches nothing
    StreamingMediaDedup.processBatch(b1, 1L, "payload", "doc_id",
      indexDir, outDir)
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 2L, 3L), s"replay duplicated rows: $out")
    assert(spark.read.parquet(indexDir).count() === 3)
  }

  test("audio kind grows an envelope index through the same harness") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadedup4").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    def clip(seed: Int): Array[Byte] = Wav.encode(8000, 1,
      Array.tabulate(1600) { i =>
        val amp = 3000 + 200 * ((i / 100 + seed) % 7)
        (if ((i / 8) % 2 == 0) amp else -amp).toShort
      })
    val b0 = Seq((1L, clip(1))).toDF("doc_id", "payload")
    val b1 = Seq((2L, clip(1)), (3L, clip(9))).toDF("doc_id", "payload")
    StreamingMediaDedup.processBatch(b0, 0L, "payload", "doc_id",
      indexDir, outDir, kind = StreamingMediaDedup.AudioEnvelope)
    StreamingMediaDedup.processBatch(b1, 1L, "payload", "doc_id",
      indexDir, outDir, kind = StreamingMediaDedup.AudioEnvelope)
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 3L), s"identical clip must dedup: $out")
  }

  test("streaming end-to-end via MemoryStream + checkpoint") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadedup5").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingMediaDedup.start(
      input.toDF().toDF("doc_id", "payload"), "payload", "doc_id",
      s"$dir/index", s"$dir/out", s"$dir/ckpt")
    try {
      input.addData((1L, img(6)))
      q.processAllAvailable()
      input.addData((2L, perturbed(6)), (3L, img(60)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(out === Seq(1L, 3L))
    } finally q.stop()
  }
}
