package graft

import graft.dedup.TextDedup
import graft.streaming.StreamingDecontaminate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit

/** Streaming decontamination: per-batch filtering against the static
  * benchmark sketch, idempotent commit windows, end-to-end stream. */
class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench =
    Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")

  private lazy val bloomName = TextDedup.registerBenchBloom(spark, bench,
    "text", name = "spec-stream-decon")

  private def contaminated(id: Long) =
    (id, s"intro $id alpha beta gamma delta epsilon zeta trailing")
  private def clean(id: Long) =
    (id, s"clean document number $id with its own unrelated words")

  test("contaminated docs drop per batch; clean docs commit under batch_id") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon").toString
    val b0 = Seq(contaminated(1L), clean(2L)).toDF("doc_id", "text")
    StreamingDecontaminate.processBatch(b0, 0L, bench, "text", "doc_id",
      bloomName, dir)
    val b1 = Seq(clean(10L), contaminated(11L), clean(12L))
      .toDF("doc_id", "text")
    StreamingDecontaminate.processBatch(b1, 1L, bench, "text", "doc_id",
      bloomName, dir)
    val out = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("batch_id"))).toSet
    assert(out === Set((2L, 0), (10L, 1), (12L, 1)))
  }

  test("replaying a batch overwrites its own partition — no duplication") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon-replay").toString
    val b = Seq(contaminated(1L), clean(2L), clean(3L)).toDF("doc_id", "text")
    StreamingDecontaminate.processBatch(b, 0L, bench, "text", "doc_id",
      bloomName, dir)
    // the crash-window replay: same batch, same id, run again
    StreamingDecontaminate.processBatch(b, 0L, bench, "text", "doc_id",
      bloomName, dir)
    val out = spark.read.parquet(dir).collect().map(_.getAs[Long]("doc_id"))
    assert(out.sorted.toSeq === Seq(2L, 3L))
  }

  test("batch-frequent shingles are NOT df-capped away (contamination still caught)") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon-df").toString
    // 30 contaminated near-copies: corpus-style df capping would mark
    // the benchmark shingles as boilerplate and let every copy through
    val rows = (1L to 30L).map(i =>
      (i, s"copy $i alpha beta gamma delta epsilon zeta trailing")) :+ clean(50L)
    val b = rows.toDF("doc_id", "text")
    StreamingDecontaminate.processBatch(b, 0L, bench, "text", "doc_id",
      bloomName, dir)
    val out = spark.read.parquet(dir).collect().map(_.getAs[Long]("doc_id"))
    assert(out.toSeq === Seq(50L))
  }

  test("compactOutput folds committed history; refuses a replayable tail") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon-compact").toString
    val (outDir, ckDir) = (s"$dir/out", s"$dir/ck")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDecontaminate.start(
      mem.toDF.toDF("doc_id", "text"), bench, "text", "doc_id",
      bloomName, outDir, ckDir)
    try {
      mem.addData(clean(1L), contaminated(2L))
      q.processAllAvailable()
      mem.addData(clean(10L), clean(11L))
      q.processAllAvailable()
    } finally q.stop()
    val before = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    // clean stop: every partition is committed → compaction folds all
    val n = StreamingDecontaminate.compactOutput(spark, outDir, ckDir,
      targetFiles = 2)
    assert(n === before.length)
    val after = spark.read.parquet(outDir)
    assert(after.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq === before)
    assert(after.select("batch_id").distinct().collect()
      .map(_.getAs[Int]("batch_id")).toSeq === Seq(-1))

    // simulate the crash window: a batch partition NEWER than the last
    // commit (written but not committed) must block compaction
    val fakeBatch = Seq((99L, "orphan")).toDF("doc_id", "text")
    fakeBatch.withColumn("batch_id", lit(999L))
      .write.mode("append").partitionBy("batch_id").parquet(outDir)
    val e = intercept[IllegalArgumentException] {
      StreamingDecontaminate.compactOutput(spark, outDir, ckDir)
    }
    assert(e.getMessage.contains("999"))
  }

  test("stream restarts cleanly after compaction; new batches land beside batch_id=-1") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon-resume").toString
    val (outDir, ckDir) = (s"$dir/out", s"$dir/ck")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q1 = StreamingDecontaminate.start(
      mem.toDF.toDF("doc_id", "text"), bench, "text", "doc_id",
      bloomName, outDir, ckDir)
    try { mem.addData(clean(1L), clean(2L)); q1.processAllAvailable() }
    finally q1.stop()
    StreamingDecontaminate.compactOutput(spark, outDir, ckDir)
    // resume from the same checkpoint: committed batch 0 is NOT replayed
    val q2 = StreamingDecontaminate.start(
      mem.toDF.toDF("doc_id", "text"), bench, "text", "doc_id",
      bloomName, outDir, ckDir)
    try { mem.addData(clean(10L), contaminated(11L)); q2.processAllAvailable() }
    finally q2.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out === Seq(1L, 2L, 10L))
  }

  test("end-to-end MemoryStream run commits exactly the clean documents") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon-e2e").toString
    val (outDir, ckDir) = (s"$dir/out", s"$dir/ck")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDecontaminate.start(
      mem.toDF.toDF("doc_id", "text"), bench, "text", "doc_id",
      bloomName, outDir, ckDir)
    try {
      mem.addData(contaminated(1L), clean(2L))
      q.processAllAvailable()
      mem.addData(clean(10L), contaminated(11L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect().map(_.getAs[Long]("doc_id"))
    assert(out.sorted.toSeq === Seq(2L, 10L))
  }

  // ── semantic twin ──

  // centroids: e1 / e2; the bench vector hugs e1
  private val semCents: Array[(Long, Array[Double], Double)] = Array(
    (0L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
    (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0))
  private lazy val semBench =
    Seq((500L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
  private def vecsDf(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("semantic twin: leaked vectors drop per batch; replay overwrites; batch union equals corpus path") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon-sem").toString
    // batch 0: vector 1 is a near-copy of the bench vector (leak),
    // vector 2 lives on the other axis (clean)
    val b0 = vecsDf(1L -> Seq(0.99, 0.02, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.0, 0.0))
    val b1 = vecsDf(10L -> Seq(0.98, 0.01, 0.0, 0.0), // leak
      11L -> Seq(0.1, 0.9, 0.0, 0.0))                 // clean
    StreamingDecontaminate.processBatchSemantic(b0, 0L, semBench,
      "embedding", "vec_id", semCents, threshold = 0.95, dir)
    StreamingDecontaminate.processBatchSemantic(b1, 1L, semBench,
      "embedding", "vec_id", semCents, threshold = 0.95, dir)
    val out = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("batch_id"))).toSet
    assert(out === Set((2L, 0), (11L, 1)))
    // replay of batch 0 replaces its own partition with itself
    StreamingDecontaminate.processBatchSemantic(b0, 0L, semBench,
      "embedding", "vec_id", semCents, threshold = 0.95, dir)
    assert(spark.read.parquet(dir).count() === 2L)
    // batch union ≡ the corpus-path survivors on the concatenated input
    val all = vecsDf(1L -> Seq(0.99, 0.02, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.0, 0.0),
      10L -> Seq(0.98, 0.01, 0.0, 0.0), 11L -> Seq(0.1, 0.9, 0.0, 0.0))
    val corpus = graft.embeddings.SemanticDedup.decontaminateSemantic(
      all, semBench, "embedding", "vec_id", semCents, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(spark.read.parquet(dir).select("vec_id").as[Long]
      .collect().toSet === corpus)
  }
}
