package graft

import graft.streaming.StreamingBm25Index
import graft.text.Relevance
import org.apache.spark.sql.functions._

/** Incremental BM25 serving index: rebuild/fresh bit-exactness,
  * merge-on-read df + stats, crash-window + restart exactly-once
  * proofs, compaction with preserved bucket partitioning, the fixed
  * bucket-count contract, and the freshness report. */
class StreamingBm25IndexSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def freshDirs(): (String, String, String) = {
    val d = java.nio.file.Files.createTempDirectory("bm25inc").toString
    (s"$d/index", s"$d/corpus", s"$d/stats")
  }

  private def scoresOf(q: String, indexDir: String, statsDir: String) =
    StreamingBm25Index.searchFromIndex(spark, indexDir, statsDir, q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("grown index serves bit-identically to the fresh computation and the rebuild index on testdata") {
    val corpus = Demo.table(spark, sf(), "documents")
    val (indexDir, corpusDir, statsDir) = freshDirs()
    (0 until 3).foreach(b => StreamingBm25Index.processBatch(
      corpus.filter(col("doc_id") % 3 === b), b.toLong, "text", "doc_id",
      buckets = 64, indexDir, corpusDir, statsDir))
    val served = StreamingBm25Index.searchFromIndex(spark, indexDir,
      statsDir, "spark window merge")
    val grown = served.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fresh = Relevance.bm25(corpus, "text", "doc_id",
      "spark window merge").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(grown == fresh && grown.nonEmpty)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("bm25-rebuild").toString + "/idx"
    Relevance.writeBm25Index(corpus, "text", "doc_id", rebuilt)
    val viaRebuild = Relevance.bm25FromIndex(spark, rebuilt,
      "spark window merge").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(grown == viaRebuild)
    // the growing layout's scan prunes to the query terms' bucket
    // sub-directories, exactly like the rebuild layout's — asserted on
    // the serve path's own scan builder (the final plan reads the
    // materialization, which hides the scan behind its checkpoint)
    val plan = StreamingBm25Index.prunedPostings(spark, indexDir,
      Array("spark", "window", "merge"), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no bucket partition filter in:\n${plan.take(2000)}")
    // unknown-term query returns empty rather than failing
    assert(StreamingBm25Index.searchFromIndex(spark, indexDir, statsDir,
      "zzzqq qqqzz").count() == 0)
  }

  test("merge-on-read df and stats are exact across epochs (hand-checked)") {
    val (indexDir, corpusDir, statsDir) = freshDirs()
    // epoch 0: "apple banana" (dl 2), "apple" (dl 1); epoch 1:
    // "banana banana apple" (dl 3) — df(apple)=3 spans both epochs
    StreamingBm25Index.processBatch(
      docs(1L -> "apple banana", 2L -> "apple"), 0L, "text", "doc_id",
      buckets = 8, indexDir, corpusDir, statsDir)
    StreamingBm25Index.processBatch(
      docs(3L -> "banana banana apple"), 1L, "text", "doc_id",
      buckets = 8, indexDir, corpusDir, statsDir)
    val fresh = Relevance.bm25(
      docs(1L -> "apple banana", 2L -> "apple", 3L -> "banana banana apple"),
      "text", "doc_id", "apple banana").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scoresOf("apple banana", indexDir, statsDir) == fresh)
    // the stats partials carry the exact corpus scalars: 3 docs, 6 tokens
    val st = spark.read.parquet(statsDir)
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    assert((st.getLong(0), st.getLong(1)) === ((3L, 6L)))
  }

  test("crash windows: replay replaces, not appends, in all three write gaps") {
    val (indexDir, corpusDir, statsDir) = freshDirs()
    val b0 = docs(1L -> "apple banana", 2L -> "banana cherry")
    StreamingBm25Index.processBatch(b0, 0L, "text", "doc_id", buckets = 8,
      indexDir, corpusDir, statsDir)
    def deleteRec(dir: String): Unit = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    // window 1: corpus committed, postings + stats lost
    deleteRec(indexDir); deleteRec(statsDir)
    StreamingBm25Index.processBatch(b0, 0L, "text", "doc_id", buckets = 8,
      indexDir, corpusDir, statsDir)
    assert(spark.read.parquet(corpusDir).count() === 2L)
    assert(spark.read.parquet(statsDir).select("n_docs").head().getLong(0) === 2L)
    // window 2: postings committed, stats lost — the epoch is
    // searchable but uncounted until replay (freshness skew, no dupes)
    deleteRec(statsDir)
    StreamingBm25Index.processBatch(b0, 0L, "text", "doc_id", buckets = 8,
      indexDir, corpusDir, statsDir)
    // window 3: full same-id replay overwrites everything with itself
    val before = scoresOf("banana", indexDir, statsDir)
    StreamingBm25Index.processBatch(b0, 0L, "text", "doc_id", buckets = 8,
      indexDir, corpusDir, statsDir)
    assert(scoresOf("banana", indexDir, statsDir) == before)
    assert(spark.read.parquet(indexDir).count() === 4L) // 4 postings, once
    assert(spark.read.parquet(statsDir).count() === 1L) // 1 partial, once
  }

  test("checkpoint restart: replayed epoch lands exactly-once; fresh epoch lands once") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-restart")
    val (srcDir, indexDir, corpusDir, statsDir, ckDir) =
      (s"$dir/src", s"$dir/index", s"$dir/corpus", s"$dir/stats", s"$dir/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val json = rows.map { case (id, t) =>
        s"""{"doc_id":$id,"text":"$t"}""" }.mkString("\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$srcDir/$name"),
        json.getBytes("UTF-8"))
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    def startQuery(ck: String) = StreamingBm25Index.start(
      spark.readStream.schema(schema).json(srcDir),
      "text", "doc_id", buckets = 8, indexDir, corpusDir, statsDir, ck)
    writeBatch("b1.json", Seq(1L -> "apple banana", 2L -> "banana cherry"))
    val q1 = startQuery(ckDir)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(corpusDir).count() === 2L)
    // clone the checkpoint minus the newest commit marker — the
    // "crashed before checkpoint commit" window — and restart with a
    // fresh epoch pending
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
    writeBatch("b2.json", Seq(10L -> "cherry date"))
    val q2 = startQuery(ck2)
    try q2.processAllAvailable() finally q2.stop()
    // epoch 1 replays onto itself; the fresh doc lands exactly once
    assert(spark.read.parquet(corpusDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L, 10L))
    val st = spark.read.parquet(statsDir)
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    assert((st.getLong(0), st.getLong(1)) === ((3L, 6L)))
    val sc = scoresOf("cherry", indexDir, statsDir)
    assert(sc.keySet === Set(2L, 10L))
  }

  test("compaction folds epochs, keeps bucket sub-partitioning, serves identically") {
    val (indexDir, corpusDir, statsDir) = freshDirs()
    StreamingBm25Index.processBatch(docs(1L -> "apple banana"), 0L,
      "text", "doc_id", buckets = 8, indexDir, corpusDir, statsDir)
    StreamingBm25Index.processBatch(docs(2L -> "banana cherry"), 1L,
      "text", "doc_id", buckets = 8, indexDir, corpusDir, statsDir)
    val before = scoresOf("banana", indexDir, statsDir)
    val (nCorpus, nIdx) = StreamingBm25Index.compact(spark, corpusDir,
      indexDir, targetFiles = 1)
    assert((nCorpus, nIdx) === ((2L, 4L)))
    assert(scoresOf("banana", indexDir, statsDir) == before,
      "compaction must not change scores")
    // the folded postings keep bucket=... directories under
    // batch_id=-1 so query pruning survives compaction
    val folded = new java.io.File(s"$indexDir/batch_id=-1")
    assert(folded.isDirectory &&
      folded.listFiles().exists(_.getName.startsWith("bucket=")),
      s"bucket sub-dirs lost: ${folded.listFiles().map(_.getName).toSeq}")
    // stats partials are NOT folded — the per-epoch freshness history
    // survives compaction
    assert(spark.read.parquet(statsDir).count() === 2L)
  }

  test("fixed bucket-count contract: mixed epochs and empty indexes are refused") {
    val (indexDir, corpusDir, statsDir) = freshDirs()
    StreamingBm25Index.processBatch(docs(1L -> "apple"), 0L, "text",
      "doc_id", buckets = 8, indexDir, corpusDir, statsDir)
    StreamingBm25Index.processBatch(docs(2L -> "banana"), 1L, "text",
      "doc_id", buckets = 16, indexDir, corpusDir, statsDir)
    val e = intercept[IllegalArgumentException] {
      StreamingBm25Index.searchFromIndex(spark, indexDir, statsDir, "apple")
    }
    assert(e.getMessage.contains("DIFFERENT bucket counts"), e.getMessage)
    val (i2, c2, s2) = freshDirs()
    StreamingBm25Index.processBatch(docs(1L -> "apple"), 0L, "text",
      "doc_id", buckets = 8, i2, c2, s2)
    // an index written before any stats partial landed (the window-2
    // crash state on the FIRST epoch) fails loudly, not silently empty
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(s2)
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    java.nio.file.Files.createDirectories(p)
    intercept[Exception] {
      StreamingBm25Index.searchFromIndex(spark, i2, s2, "apple")
    }
  }

  test("deleteDocs: post-delete serving is bit-identical to an index grown from the survivors; stats repaired; bucket dirs kept") {
    val s = spark
    import s.implicits._
    val (indexDir, corpusDir, statsDir) = freshDirs()
    StreamingBm25Index.processBatch(
      docs(1L -> "apple banana", 2L -> "banana cherry"), 0L, "text",
      "doc_id", buckets = 8, indexDir, corpusDir, statsDir)
    StreamingBm25Index.processBatch(
      docs(3L -> "apple date", 4L -> "banana fig"), 1L, "text",
      "doc_id", buckets = 8, indexDir, corpusDir, statsDir)
    val (nc, ni) = StreamingBm25Index.deleteDocs(spark, corpusDir,
      indexDir, statsDir, "text", Seq(2L, 3L).toDF("doc_id"))
    assert(nc === 2L && ni === 4L) // 2 docs, 2 postings each survive
    // invariant: identical to an index grown from the survivors alone
    val (i2, c2, s2) = freshDirs()
    StreamingBm25Index.processBatch(docs(1L -> "apple banana"), 0L,
      "text", "doc_id", buckets = 8, i2, c2, s2)
    StreamingBm25Index.processBatch(docs(4L -> "banana fig"), 1L,
      "text", "doc_id", buckets = 8, i2, c2, s2)
    for (q <- Seq("apple", "banana", "cherry date fig"))
      assert(scoresOf(q, indexDir, statsDir) === scoresOf(q, i2, s2),
        s"post-delete serving diverged on '$q'")
    // the rewritten epoch partitions keep their bucket= sub-dirs
    val b0 = new java.io.File(s"$indexDir/batch_id=0")
    assert(b0.isDirectory &&
      b0.listFiles().exists(_.getName.startsWith("bucket=")),
      s"bucket sub-dirs lost: ${b0.listFiles().map(_.getName).toSeq}")
    // stats repaired: totals reflect only survivors (2 docs, 4 tokens)
    val st = spark.read.parquet(statsDir)
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    assert((st.getLong(0), st.getLong(1)) === ((2L, 4L)))
    // deleting everything drops the stats layer → serve fails loudly
    StreamingBm25Index.deleteDocs(spark, corpusDir, indexDir, statsDir,
      "text", Seq(1L, 4L).toDF("doc_id"))
    intercept[Exception] {
      StreamingBm25Index.searchFromIndex(spark, indexDir, statsDir, "apple")
    }
  }

  test("freshness report: per-epoch counts, avgdl and shares hand-checked") {
    val (indexDir, corpusDir, statsDir) = freshDirs()
    StreamingBm25Index.processBatch(
      docs(1L -> "a b", 2L -> "a b c d"), 0L, "text", "doc_id",
      buckets = 8, indexDir, corpusDir, statsDir)
    StreamingBm25Index.processBatch(
      docs(3L -> "a b c d e f g h"), 1L, "text", "doc_id",
      buckets = 8, indexDir, corpusDir, statsDir)
    val rep = StreamingBm25Index.freshnessReport(spark, statsDir)
      .orderBy("batch_id").collect()
    assert(rep.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 2L), (1L, 1L)))
    // epoch 0: avgdl 3.0, 2/3 of docs; epoch 1: avgdl 8.0, 1/3 — the
    // drift a retrain/re-rank review reads
    assert(rep(0).getDouble(2) === 3.0 && rep(0).getDouble(3) === 0.6667)
    assert(rep(1).getDouble(2) === 8.0 && rep(1).getDouble(3) === 0.3333)
  }
}
