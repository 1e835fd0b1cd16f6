package graft

import graft.streaming.{GrowingIndex, Streams, StreamingDedup, StreamingSemdedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Structured Streaming operators over MemoryStream micro-batches. */
class StreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup within watermark drops re-sent ids") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = Streams.dedupWithinWatermark(
      input.toDF().toDF("id", "ts"), "id", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((1L, ts("2026-01-01 10:00:00")),
        (2L, ts("2026-01-01 10:00:10")), (1L, ts("2026-01-01 10:00:20")))
      q.processAllAvailable()
      input.addData((2L, ts("2026-01-01 10:01:00")),
        (3L, ts("2026-01-01 10:01:30")))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming windowed counts aggregate by event-time window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, Double)]
    val counts = Streams.windowedCounts(
      input.toDF().toDF("etype", "ts", "value"),
      "ts", "etype", "value", window = "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("win_out").outputMode("complete").start()
    try {
      input.addData(
        ("click", ts("2026-01-01 10:05:00"), 1.0),
        ("click", ts("2026-01-01 10:55:00"), 2.0),
        ("click", ts("2026-01-01 11:05:00"), 4.0),
        ("view", ts("2026-01-01 10:10:00"), 8.0))
      q.processAllAvailable()
      val out = spark.table("win_out")
        .orderBy("etype", "window_start").collect()
      assert(out.length === 3)
      val clicks10 = out.head
      assert(clicks10.getAs[Long]("n") === 2 &&
        clicks10.getAs[Double]("sum_value") === 3.0)
    } finally q.stop()
  }

  test("streaming sessionize closes a session on in-batch gap") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, Double)]
    val sessions = Streams.sessionize(
      input.toDS().withWatermark("_2", "5 minutes"), gapMs = 60000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      // burst 1 (2 events, 30s apart) … 10min silence … burst 2
      input.addData(
        ("u1", ts("2026-01-01 10:00:00"), 1.0),
        ("u1", ts("2026-01-01 10:00:30"), 2.0),
        ("u1", ts("2026-01-01 10:10:00"), 4.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").collect()
      assert(out.length === 1) // first burst closed by the gap
      val s = out.head
      assert(s.getAs[String]("key") === "u1")
      assert(s.getAs[Long]("n_events") === 2 &&
        s.getAs[Double]("sum_value") === 3.0)
      assert(s.getAs[Timestamp]("session_end") === ts("2026-01-01 10:00:30"))
    } finally q.stop()
  }

  test("parquet sink + checkpoint: restart resumes exactly-once") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream-sink")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val input = MemoryStream[(Long, Timestamp)]
    def start() = Streams.dedupWithinWatermark(
      input.toDF().toDF("id", "ts"), "id", "ts", "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    input.addData((1L, ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:00:05")), (1L, ts("2026-01-01 10:00:06")))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint; dedup state survives (id 2 re-sent)
    val q2 = start()
    input.addData((2L, ts("2026-01-01 10:00:30")),
      (3L, ts("2026-01-01 10:00:40")))
    q2.processAllAvailable()
    q2.stop()

    val result = spark.read.parquet(out)
    assert(result.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L))
  }

  test("batch sessionize: gap splits, rollups correct") {
    import spark.implicits._
    val df = Seq(
      ("u1", ts("2026-01-01 10:00:00"), 1.0),
      ("u1", ts("2026-01-01 10:00:30"), 2.0),
      ("u1", ts("2026-01-01 10:10:00"), 4.0),
      ("u2", ts("2026-01-01 09:00:00"), 8.0))
      .toDF("user_id", "ts", "value")
    val out = Streams.Batch.sessionize(df, "user_id", "ts", "value", 60000L)
      .orderBy("key", "session_start").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_events") === 2 &&
      out(0).getAs[Double]("sum_value") === 3.0)
    assert(out(1).getAs[Long]("n_events") === 1 &&
      out(1).getAs[Double]("sum_value") === 4.0)
    assert(out(2).getAs[String]("key") === "u2")
  }

  test("stream-stream interval join pairs events within the lookback") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streams.intervalJoin(
      purchases.toDF().toDF("user_id", "ts", "amount"),
      clicks.toDF().toDF("c_user", "click_ts", "click_value"),
      "user_id", "c_user", "ts", "click_ts", lookback = "30 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("ij_out").outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2026-01-01 10:00:00"), 1.0),  // within 30m of purchase
        (1L, ts("2026-01-01 09:00:00"), 2.0),  // too old
        (2L, ts("2026-01-01 10:20:00"), 3.0))  // other user
      purchases.addData((1L, ts("2026-01-01 10:15:00"), 50.0))
      q.processAllAvailable()
      val out = spark.table("ij_out").collect()
      assert(out.length === 1)
      assert(out.head.getAs[Double]("click_value") === 1.0)
    } finally q.stop()
  }

  test("running heavy hitters keep bounded state across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String)]
    val hh = Streams.runningHeavyHitters(input.toDS(), k = 4, topN = 2)
      .toDF("key", "top")
    val q = hh.writeStream.format("memory")
      .queryName("hh_out").outputMode("update").start()
    try {
      input.addData(("g", "a"), ("g", "a"), ("g", "b"))
      q.processAllAvailable()
      input.addData(("g", "a"), ("g", "c"), ("g", "c"), ("g", "c"))
      q.processAllAvailable()
      // latest update row for g: a=3, c=3 merged across batches
      val latest = spark.table("hh_out").collect().last
      val top = latest.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(top == Seq(("a", 3L), ("c", 3L)))
    } finally q.stop()
  }

  test("streaming incremental dedup: second batch dedups against the first's index") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString
    val (indexDir, outDir, ckDir) = (s"$dir/index", s"$dir/out", s"$dir/ck")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val nearDup = base.replace("tango", "uniform") // 1 of 20 tokens differs
    val fresh = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(input.toDF().toDF("doc_id", "text"),
      "text", "doc_id", indexDir, outDir, ckDir, threshold = 0.7)
    try {
      // batch 1: two copies of base (internal exact dup) + one near-dup
      input.addData((1L, base), (2L, base), (3L, nearDup))
      q.processAllAvailable()
      val b1 = spark.read.parquet(outDir).collect()
      // 2 dropped as internal exact dup of 1; 3 is batch-internal near-dup
      // which dedupAgainstIndex intentionally does NOT remove
      assert(b1.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 3L))
      // batch 2: exact dup of base, near-dup of base, genuinely new doc
      input.addData((10L, base), (11L, base.replace("alpha", "zulu")),
        (12L, fresh))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir).collect()
      assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 3L, 12L))
      // the index grew by exactly the survivors
      val idx = spark.read.parquet(indexDir).collect()
      assert(idx.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 3L, 12L))
    } finally q.stop()
  }

  test("streaming semdedup: second batch dedups against the first's code index") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ssem").toString
    val (indexDir, outDir, ckDir) = (s"$dir/index", s"$dir/out", s"$dir/ck")
    val cents: Array[(Long, Array[Double], Double)] = Array(
      (0L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0))
    val base = Seq(0.9, 0.1, 0.0, 0.0)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamingSemdedup.start(
      input.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
      cents, indexDir, outDir, ckDir, threshold = 0.9)
    try {
      // batch 1: exact internal dup (2 of 1) + a distinct vector
      input.addData((1L, base), (2L, base), (3L, Seq(0.0, 1.0, 0.0, 0.0)))
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).collect()
        .map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(1L, 3L))
      // batch 2: exact dup of base, a near-dup of base (cos ≈ 0.9996),
      // and a genuinely new direction
      input.addData((10L, base), (11L, Seq(0.89, 0.11, 0.0, 0.0)),
        (12L, Seq(0.0, 0.0, 1.0, 0.0)))
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).collect()
        .map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(1L, 3L, 12L))
      // the index grew by exactly the survivors, as compressed codes
      val idx = spark.read.parquet(indexDir)
      assert(idx.collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
        === Seq(1L, 3L, 12L))
      assert(idx.schema.fieldNames.toSet ===
        Set("cluster", "vec_id", "scale", "q", "batch_id"))
    } finally q.stop()
  }

  test("streaming semdedup restart: checkpoint replay keeps index/corpus exactly-once") {
    // Same crash-window recipe as the text-dedup restart proof below:
    // clone the checkpoint minus the newest commit marker, restart from
    // the clone, and prove the replayed epoch re-dedups against its OWN
    // index rows (a vector's ADC cosine to its own int8 codes ≈ 1).
    val dir = java.nio.file.Files.createTempDirectory("ssem-restart")
    val (srcDir, indexDir, outDir, ckDir) =
      (s"$dir/src", s"$dir/index", s"$dir/out", s"$dir/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val cents: Array[(Long, Array[Double], Double)] = Array(
      (0L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0))
    def writeBatch(name: String, rows: Seq[(Long, Seq[Double])]): Unit = {
      val json = rows.map { case (id, v) =>
        s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}""" }.mkString("\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$srcDir/$name"),
        json.getBytes("UTF-8"))
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("vec_id", "long").add("embedding", "array<double>")
    def startQuery(ck: String) = StreamingSemdedup.start(
      spark.readStream.schema(schema).json(srcDir),
      "embedding", "vec_id", cents, indexDir, outDir, ck, threshold = 0.9)

    val base = Seq(0.9, 0.1, 0.0, 0.0)
    writeBatch("b1.json", Seq((1L, base), (2L, base),
      (3L, Seq(0.0, 1.0, 0.0, 0.0))))
    val q1 = startQuery(ckDir)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(1L, 3L))

    import scala.jdk.CollectionConverters._
    val ck2 = s"$dir/ck2"
    val srcRoot = java.nio.file.Paths.get(ckDir)
    java.nio.file.Files.walk(srcRoot).iterator().asScala.toSeq.foreach { p =>
      val dst = java.nio.file.Paths.get(ck2).resolve(srcRoot.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    }
    val commits = java.nio.file.Paths.get(s"$ck2/commits")
    val newest = java.nio.file.Files.list(commits).iterator().asScala
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(newest)
    java.nio.file.Files.deleteIfExists(
      newest.resolveSibling(s".${newest.getFileName}.crc"))

    writeBatch("b2.json", Seq((10L, base),
      (12L, Seq(0.0, 0.0, 1.0, 0.0))))
    val q2 = startQuery(ck2)
    try q2.processAllAvailable() finally q2.stop()

    // Epoch 1 replays: 1 and 3 dedup against their own index rows;
    // batch 2's fresh vector lands exactly once.
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq
    val idx = spark.read.parquet(indexDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(out === Seq(1L, 3L, 12L), s"corpus not exactly-once: $out")
    assert(idx === Seq(1L, 3L, 12L), s"index not exactly-once: $idx")
  }

  test("crash between the two writes: batch replay replaces, not appends") {
    // The window the checkpoint-replay tests below CANNOT reach from the
    // streaming API: the corpus write committed but the index write did
    // not. Simulate it by processing a batch, deleting the index's
    // batch_id partition (as if the crash hit before it landed), and
    // re-running the SAME batch id — the replay must overwrite the
    // corpus partition with identical rows, not append a second copy.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("halfcommit").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val batch = Seq((1L, base), (2L, base), (3L, "one two three four five " +
      "six seven eight nine ten eleven twelve thirteen fourteen fifteen " +
      "sixteen seventeen eighteen nineteen twenty")).toDF("doc_id", "text")
    StreamingDedup.processBatch(batch, batchId = 0L, "text", "doc_id",
      indexDir, outDir, threshold = 0.7)
    // crash window: the index commit is lost (for the stream's FIRST
    // batch that means the index dir never appeared), the corpus commit
    // survives
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    deleteRec(java.nio.file.Paths.get(indexDir))
    StreamingDedup.processBatch(batch, batchId = 0L, "text", "doc_id",
      indexDir, outDir, threshold = 0.7)
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    val idx = spark.read.parquet(indexDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 3L), s"corpus duplicated on half-commit replay: $out")
    assert(idx === Seq(1L, 3L), s"index wrong after half-commit replay: $idx")
  }

  test("index compaction folds batch partitions; replay stays exactly-once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val fresh = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val b0 = Seq((1L, base)).toDF("doc_id", "text")
    val b1 = Seq((2L, fresh)).toDF("doc_id", "text")
    StreamingDedup.processBatch(b0, 0L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    StreamingDedup.processBatch(b1, 1L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    val (nOut, nIdx) = GrowingIndex.compact(spark, outDir, indexDir,
      targetFiles = 1)
    assert(nOut === 2L && nIdx === 2L)
    // one folded partition each, same rows
    val idx = spark.read.parquet(indexDir)
    assert(idx.select("batch_id").distinct().collect()
      .map(_.getAs[Number]("batch_id").longValue()).toSeq ===
      Seq(GrowingIndex.CompactedBatchId))
    assert(idx.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq ===
      Seq(1L, 2L))
    // a batch replayed AFTER its partition was folded away: its rows now
    // live under batch_id=-1, so dedup yields zero survivors and the
    // empty overwrite touches nothing
    StreamingDedup.processBatch(b1, 1L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L))
    // and a genuinely new batch still dedups against the compacted index
    StreamingDedup.processBatch(Seq((9L, base), (10L, "únique wholly new " +
      "tokens aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr"))
      .toDF("doc_id", "text"), 2L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L, 10L))
  }

  test("deleteKeys: retention reaches corpus and index; the delete's crash windows converge safely") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gi-delete").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val fresh = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    StreamingDedup.processBatch(Seq((1L, base)).toDF("doc_id", "text"),
      0L, "text", "doc_id", indexDir, outDir, threshold = 0.7)
    StreamingDedup.processBatch(Seq((2L, fresh)).toDF("doc_id", "text"),
      1L, "text", "doc_id", indexDir, outDir, threshold = 0.7)
    def ids(path: String): Seq[Long] = spark.read.parquet(path).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ids(outDir) === Seq(1L, 2L) && ids(indexDir) === Seq(1L, 2L))

    val doomed = Seq(1L).toDF("doc_id")
    // crash window: the delete dies BETWEEN the two relations — corpus
    // cleaned, index intact. This is the SAFE direction: the retained
    // fingerprint can only DROP copies of the deleted content.
    graft.io.ParquetSink.deleteByKeys(spark, outDir, "batch_id",
      "doc_id", doomed)
    assert(ids(outDir) === Seq(2L) && ids(indexDir) === Seq(1L, 2L))
    StreamingDedup.processBatch(Seq((50L, base)).toDF("doc_id", "text"),
      2L, "text", "doc_id", indexDir, outDir, threshold = 0.7)
    assert(ids(outDir) === Seq(2L),
      "deleted content must not resurrect while its index rows remain")
    // recovery = re-run the (idempotent) delete: converges to both-clean
    val (nOut, nIdx) = GrowingIndex.deleteKeys(spark, outDir, indexDir,
      "doc_id", doomed)
    assert(nOut === 1L && nIdx === 1L)
    assert(ids(outDir) === Seq(2L) && ids(indexDir) === Seq(2L))
    // post-delete semantics (documented): the same content arriving in a
    // FUTURE batch is new data — deletion is not a blocklist
    StreamingDedup.processBatch(Seq((60L, base)).toDF("doc_id", "text"),
      3L, "text", "doc_id", indexDir, outDir, threshold = 0.7)
    assert(ids(outDir) === Seq(2L, 60L) && ids(indexDir) === Seq(2L, 60L))
    // delete EVERY remaining key: the rewrite drops all batch_id
    // partition dirs, and the survivor read-back must report 0 rows
    // instead of throwing on the now-partition-less roots (r10 ADVICE)
    val (zOut, zIdx) = GrowingIndex.deleteKeys(spark, outDir, indexDir,
      "doc_id", Seq(2L, 60L).toDF("doc_id"))
    assert(zOut === 0L && zIdx === 0L)
  }

  test("semdedup compaction: folded replay relies on ADC self-match and holds") {
    // The semantic operator's post-compaction replay guarantee is the
    // ADC cosine of a vector against its OWN int8 codes (≈ 0.999),
    // not an exact digest match — prove the folded replay stays
    // exactly-once at a realistic threshold.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ssem-compact").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val cents: Array[(Long, Array[Double], Double)] = Array(
      (0L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0))
    val base = Seq(0.9, 0.1, 0.0, 0.0)
    val b0 = Seq((1L, base), (3L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val b1 = Seq((12L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    StreamingSemdedup.processBatch(b0, 0L, "embedding", "vec_id", cents,
      indexDir, outDir, threshold = 0.9)
    StreamingSemdedup.processBatch(b1, 1L, "embedding", "vec_id", cents,
      indexDir, outDir, threshold = 0.9)
    val (nOut, nIdx) = GrowingIndex.compact(spark, outDir, indexDir,
      targetFiles = 1)
    assert(nOut === 3L && nIdx === 3L)
    // replay batch 1 after its partitions were folded away: its vector
    // ADC-matches its own codes under batch_id=-1 → empty overwrite
    StreamingSemdedup.processBatch(b1, 1L, "embedding", "vec_id", cents,
      indexDir, outDir, threshold = 0.9)
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(1L, 3L, 12L))
    // and fresh near-dups of folded history are still caught
    StreamingSemdedup.processBatch(
      Seq((20L, base), (21L, Seq(0.0, 0.0, 0.0, 1.0)))
        .toDF("vec_id", "embedding"),
      2L, "embedding", "vec_id", cents, indexDir, outDir, threshold = 0.9)
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(1L, 3L, 12L, 21L))
  }

  test("compaction guard rails: half-commit refusal, .old leftovers, mid-swap reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact-guards").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val fresh = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val b0 = Seq((1L, base)).toDF("doc_id", "text")
    val b1 = Seq((2L, fresh)).toDF("doc_id", "text")
    StreamingDedup.processBatch(b0, 0L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    StreamingDedup.processBatch(b1, 1L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    def deleteRec(path: String): Unit = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    // 1. corpus batch with no index partition (crash between commit's
    //    writes) → compact must refuse, not fold the orphan away
    deleteRec(s"$indexDir/batch_id=1")
    val e1 = intercept[IllegalArgumentException] {
      GrowingIndex.compact(spark, outDir, indexDir, targetFiles = 1)
    }
    assert(e1.getMessage.contains("no index partition"))
    // repair the way a stream restart would: replay the batch
    StreamingDedup.processBatch(b1, 1L, "text", "doc_id", indexDir, outDir,
      threshold = 0.7)
    // 2. a leftover .old (interrupted prior compaction) blocks compaction
    //    instead of being deleted — it may be the only copy
    val oldDir = java.nio.file.Paths.get(s"$indexDir.old")
    java.nio.file.Files.createDirectories(oldDir)
    val e2 = intercept[IllegalArgumentException] {
      GrowingIndex.compact(spark, outDir, indexDir, targetFiles = 1)
    }
    assert(e2.getMessage.contains("interrupted compaction"))
    // 3. live dir missing + .old present (crash between the two swap
    //    renames) → read must fail loudly, not dedup against nothing
    deleteRec(indexDir)
    val e3 = intercept[IllegalStateException] {
      GrowingIndex.read(spark, indexDir)
    }
    assert(e3.getMessage.contains("interrupted mid-swap"))
    // 4. targetFiles must be validated before anything is touched
    deleteRec(s"$indexDir.old")
    intercept[IllegalArgumentException] {
      GrowingIndex.compact(spark, outDir, indexDir, targetFiles = 0)
    }
  }

  test("compaction: full row identity, and every crash window recovers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact-ident").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val texts = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango",
      "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty",
      "red orange yellow green blue indigo violet cyan magenta teal " +
        "maroon olive navy aqua coral amber jade ruby pearl onyx")
    texts.zipWithIndex.foreach { case (t, i) =>
      StreamingDedup.processBatch(Seq((i.toLong, t)).toDF("doc_id", "text"),
        i.toLong, "text", "doc_id", indexDir, outDir, threshold = 0.7)
    }
    def rowsOf(d: String): Set[String] =
      spark.read.parquet(d).drop("batch_id").collect()
        .map(_.mkString("|")).toSet
    val (outBefore, idxBefore) = (rowsOf(outDir), rowsOf(indexDir))

    // crash window A: compaction died BEFORE the first rename — a stale
    // .compacting sibling exists. The live layout is untouched (reads
    // serve it), and a re-run drops the leftover and completes.
    val staleTmp = java.nio.file.Paths.get(s"$indexDir.compacting")
    java.nio.file.Files.createDirectories(staleTmp)
    java.nio.file.Files.write(staleTmp.resolve("junk"), Array[Byte](1))
    assert(rowsOf(indexDir) === idxBefore)
    GrowingIndex.compact(spark, outDir, indexDir, targetFiles = 2)
    // identity of output: every row of BOTH relations survives
    // compaction bit-for-bit (only batch_id is rewritten)
    assert(rowsOf(outDir) === outBefore)
    assert(rowsOf(indexDir) === idxBefore)
    // and the small-files tail is actually folded
    def dataFiles(d: String): Seq[java.io.File] =
      new java.io.File(d + "/batch_id=-1").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(dataFiles(indexDir).size <= 2)

    // crash window B: died between the two renames — live dir gone,
    // .old holds the only copy. Recover exactly as read()'s error
    // instructs (mv .old back) and prove full restoration.
    val live = java.nio.file.Paths.get(indexDir)
    val old = java.nio.file.Paths.get(s"$indexDir.old")
    def moveTree(a: java.nio.file.Path, b: java.nio.file.Path): Unit =
      java.nio.file.Files.move(a, b)
    moveTree(live, old)
    intercept[IllegalStateException] { GrowingIndex.read(spark, indexDir) }
    moveTree(old, live)
    assert(rowsOf(indexDir) === idxBefore)
    // post-recovery the pair is fully functional: a new batch commits
    // and a follow-up compaction still preserves every row
    StreamingDedup.processBatch(
      Seq((7L, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho " +
        "sigma tau upsilon phi chi psi omega alef")).toDF("doc_id", "text"),
      7L, "text", "doc_id", indexDir, outDir, threshold = 0.7)
    val outWith7 = rowsOf(outDir)
    assert(outWith7.size === outBefore.size + 1)
    GrowingIndex.compact(spark, outDir, indexDir, targetFiles = 1)
    assert(rowsOf(outDir) === outWith7)
  }

  test("streaming dedup restart: checkpoint replay keeps index/corpus exactly-once") {
    // Round-5 verdict #7: kill the query, FORCE a batch replay (delete
    // the checkpoint's last commit marker — exactly the state a crash
    // between epoch processing and commit leaves behind), restart
    // against the same checkpoint, and prove the parquet index and
    // corpus hold exactly-once contents. Uses a FILE source (not
    // MemoryStream) so offset recovery exercises the real
    // checkpoint-restore path.
    val dir = java.nio.file.Files.createTempDirectory("sdedup-restart")
    val (srcDir, indexDir, outDir, ckDir) =
      (s"$dir/src", s"$dir/index", s"$dir/out", s"$dir/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val fresh = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val json = rows.map { case (id, t) =>
        s"""{"doc_id":$id,"text":"$t"}""" }.mkString("\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$srcDir/$name"),
        json.getBytes("UTF-8"))
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    def startQuery(ck: String) = StreamingDedup.start(
      spark.readStream.schema(schema).json(srcDir),
      "text", "doc_id", indexDir, outDir, ck, threshold = 0.7)

    writeBatch("b1.json", Seq((1L, base), (2L, base), (3L, fresh)))
    val q1 = startQuery(ckDir)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 3L))

    // Engineer the crash window: clone the checkpoint WITHOUT the
    // newest commit marker — exactly the on-disk state a crash between
    // epoch processing and commit leaves — and restart from the clone
    // (a fresh path, so the JVM-wide HDFSMetadataLog cache cannot mask
    // the missing commit; deleting in place trips its
    // concurrent-modification guard instead of simulating a crash).
    import scala.jdk.CollectionConverters._
    val ck2 = s"$dir/ck2"
    val srcRoot = java.nio.file.Paths.get(ckDir)
    java.nio.file.Files.walk(srcRoot).iterator().asScala.toSeq.foreach { p =>
      val dst = java.nio.file.Paths.get(ck2).resolve(srcRoot.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    }
    val commits = java.nio.file.Paths.get(s"$ck2/commits")
    val newest = java.nio.file.Files.list(commits).iterator().asScala
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(newest)
    // ... and its Hadoop ChecksumFileSystem twin: a stale .N.crc makes
    // the replayed commit's rename fail as if the file still existed.
    java.nio.file.Files.deleteIfExists(
      newest.resolveSibling(s".${newest.getFileName}.crc"))

    writeBatch("b2.json", Seq((10L, base), (12L, "zeta eta theta iota " +
      "kappa mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
      "omega one1 two2")))
    val q2 = startQuery(ck2)
    try q2.processAllAvailable() finally q2.stop()

    // Replayed epoch re-dedups against its OWN index rows (content-keyed
    // idempotence), so nothing duplicates; batch 2 lands once.
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    val idx = spark.read.parquet(indexDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 3L, 12L), s"corpus not exactly-once: $out")
    assert(idx === Seq(1L, 3L, 12L), s"index not exactly-once: $idx")
  }
}
