package graft.streaming

import graft.dedup.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming eval-set decontamination — the ingest-time twin of
 * [[TextDedup.decontaminateBloom]]: each micro-batch is checked for
 * benchmark contamination (n-gram containment against the STATIC
 * benchmark set, Bloom-prefiltered map-side) and only clean documents
 * are committed. The benchmark sketch is a deploy-time artifact,
 * registered once via [[TextDedup.registerBenchBloom]] before the
 * stream starts — exactly how a production ingest pins its eval-suite
 * filter for the life of a deployment.
 *
 * Unlike [[StreamingDedup]]/[[StreamingSemdedup]] this operator is
 * STATELESS across batches (the benchmark does not grow with the
 * corpus), so the exactly-once story needs no growing index and no
 * pair precondition: each batch's output is a pure deterministic
 * function of (batch, bench), committed by dynamic overwrite of its
 * own `batch_id` partition. Every crash window replays to an
 * identical overwrite — idempotent by construction.
 *
 * Scale shape per batch: the contamination check is batch × bench,
 * with the batch-side inverted index gated by the Bloom sketch before
 * its only shuffle; cost is linear in the micro-batch and independent
 * of everything committed before it.
 */
object StreamingDecontaminate {

  /** One micro-batch: drop contaminated docs, idempotently commit the
    * clean remainder to `outDir` under its own `batch_id` partition.
    *
    * The df cap is floored at the batch's full size (`maxDfFrac = 1`):
    * document frequency inside ONE micro-batch says nothing about
    * corpus-wide boilerplate (a batch of 50 near-identical crawl pages
    * would cap every shingle and mask real contamination), so the
    * batch path verifies against the full benchmark evidence. The
    * Bloom gate — not the df cap — is what bounds the join here, and
    * it is corpus-frequency-independent. */
  def processBatch(batch: DataFrame, batchId: Long, bench: DataFrame,
      textCol: String, idCol: String, bloomName: String, outDir: String,
      n: Int = 3, threshold: Double = 0.8): Unit = {
    if (batch.isEmpty) return
    val clean = TextDedup.decontaminateBloom(batch, bench, textCol, idCol,
      bloomName, n, threshold, maxDfFrac = 1.0,
      maxDfFloor = Long.MaxValue)
    clean.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
  }

  /** The SEMANTIC twin of [[processBatch]]: drop batch vectors whose
    * embedding near-duplicates an eval vector
    * ([[graft.embeddings.SemanticDedup.decontaminateSemantic]] — the
    * bench side probes its nprobe nearest cells under the FIXED
    * centroid model, the batch side is map-side-assigned). Same
    * stateless exactly-once story: the bench and centroids are
    * deploy-time constants, so each batch's survivors are a pure
    * deterministic function of (batch, bench, cents) and the dynamic
    * overwrite of its own partition replays idempotently. One
    * difference from the corpus path is deliberate: `maxCell` gates on
    * the BATCH's per-cell population (a within-batch embedding
    * collapse), not the whole corpus's — per-batch frequency says
    * nothing about corpus-wide cells, mirroring [[processBatch]]'s
    * df-cap reasoning. Survivor union across batches equals the
    * corpus-path survivors exactly (contamination of a vector depends
    * only on the vector, bench, and model — never on other batch
    * members), which is the batch twin's correctness gate. */
  def processBatchSemantic(batch: DataFrame, batchId: Long,
      bench: DataFrame, vecCol: String, idCol: String,
      cents: Array[(Long, Array[Double], Double)], threshold: Double,
      outDir: String, nprobe: Int = 2,
      maxCell: Long = 100000L): Unit = {
    if (batch.isEmpty) return
    graft.embeddings.SemanticDedup.decontaminateSemantic(batch, bench,
      vecCol, idCol, cents, threshold, nprobe, maxCell)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
  }

  /** Start the semantic stream — [[start]]'s shape with the embedding
    * check; `cents` is the deploy-time frozen centroid model. */
  def startSemantic(vecs: DataFrame, bench: DataFrame, vecCol: String,
      idCol: String, cents: Array[(Long, Array[Double], Double)],
      threshold: Double, outDir: String, checkpointDir: String,
      nprobe: Int = 2, maxCell: Long = 100000L): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchSemantic(batch, batchId, bench, vecCol, idCol, cents,
          threshold, outDir, nprobe, maxCell)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /**
   * Offline small-files maintenance for the clean-output corpus: fold
   * the one-partition-per-epoch history into a single
   * `batch_id=-1` partition of `targetFiles` files, with
   * [[GrowingIndex]]'s crash-safe directory swap. Run while the stream
   * is stopped.
   *
   * Replay safety here needs a DIFFERENT precondition than the
   * dedup/semdedup pair compactor (those dedup a replayed batch
   * against the index; this operator has no index): a batch partition
   * may only be folded away if Structured Streaming can NEVER re-run
   * that batch. On restart the engine resumes from lastCommitted+1, so
   * the safe set is ids ≤ the checkpoint's MAXIMUM committed batch id —
   * deliberately not "has a commit marker": the commits log is pruned
   * (`minBatchesToRetain`), so old-enough batches lose their markers
   * while remaining strictly non-replayable. The check below refuses
   * if any output partition is NEWER than the last commit — restart
   * the stream once (the replay completes + commits it), stop cleanly,
   * then compact. With the precondition held, a later crash can only
   * replay a batch whose partition was NOT folded, and its dynamic
   * overwrite replaces that partition exactly as in normal operation.
   */
  def compactOutput(spark: org.apache.spark.sql.SparkSession,
      outDir: String, checkpointDir: String, targetFiles: Int = 8): Long = {
    require(targetFiles > 0, s"targetFiles=$targetFiles must be positive")
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hc)
    def numericNames(dir: org.apache.hadoop.fs.Path): Set[Long] =
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.forall(_.isDigit)).map(_.toLong).toSet
    val lastCommitted =
      numericNames(new org.apache.hadoop.fs.Path(s"$checkpointDir/commits"))
        .maxOption.getOrElse(-1L)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    // Nothing to fold is a clean no-op, not a crash: the dir may not
    // exist yet (every batch empty — processBatch writes nothing) or
    // hold no batch partitions (only _SUCCESS / a previous batch_id=-1).
    if (!fs.exists(outPath)) return 0L
    val partitions = fs.listStatus(outPath)
      .toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).toSet
    if (partitions.isEmpty) return 0L
    val replayable =
      (partitions - GrowingIndex.CompactedBatchId).filter(_ > lastCommitted)
    require(replayable.isEmpty,
      s"output batches ${replayable.toSeq.sorted.mkString(", ")} are newer " +
        "than the checkpoint's last commit — Structured Streaming may " +
        "replay them, and a replay after folding would APPEND a second " +
        "copy; restart the stream (the replay completes and commits " +
        "them), stop cleanly, then compact")
    GrowingIndex.compactOne(spark, fs, outDir, targetFiles)
  }

  /** Start the stream: `docs` is a streaming DataFrame with `idCol`
    * and `textCol`; `bench` is the static benchmark table whose
    * shingle sketch is already registered under `bloomName`.
    * Checkpointed; replays re-run `processBatch`, which overwrites the
    * same partition with the same rows. */
  def start(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, bloomName: String, outDir: String,
      checkpointDir: String, n: Int = 3,
      threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, bench, textCol, idCol, bloomName,
          outDir, n, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
