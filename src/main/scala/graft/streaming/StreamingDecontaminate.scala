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
