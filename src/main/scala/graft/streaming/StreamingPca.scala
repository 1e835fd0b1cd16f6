package graft.streaming

import graft.embeddings.Pca
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental PCA — the growing-index pattern applied to a
 * TRAINER: each micro-batch appends its vectors to the corpus and its
 * ADDITIVE sufficient statistics ([[Pca.batchStats]] — count, micro
 * sums, max-|micro| guard, raw second moments; all exact integers) to
 * a growing stats index. Fitting ([[fitFromDir]]) aggregates the whole
 * index and is BIT-IDENTICAL to a batch [[Pca.fit]] over everything
 * the stream has accepted — so the model needs no epoch bookkeeping,
 * no decay, and shares the batch oracle.
 *
 * Exactly-once: both relations commit per batch via
 * [[GrowingIndex.commit]] (dynamic overwrite of the batch's own
 * `batch_id` partition). The crash-window argument is SIMPLER than the
 * dedup streams': statistics are a deterministic pure function of the
 * batch — no read of prior state feeds the write — so a replay in ANY
 * window rewrites its partitions with identical rows and totals never
 * double-count. ([[GrowingIndex.compact]] applies unchanged if the
 * partition tail ever needs folding.)
 *
 * Scale shape: two corpus passes per batch (the [[Pca.fit]] shapes) at
 * batch grain; the stats index grows at d²+2d+1 rows per batch —
 * ~4 KB/epoch at d=64 — and the fit-time aggregation is over stat
 * rows, never vectors.
 */
object StreamingPca {

  /** One micro-batch: append the vectors and their additive statistics
    * (idempotent per `batchId` — [[GrowingIndex.commit]]). `d` is
    * pinned for the stream's lifetime (batches can be empty, so the
    * dimensionality cannot be probed). */
  def processBatch(batch: DataFrame, batchId: Long, vecCol: String,
      idCol: String, d: Int, outDir: String, statsDir: String): Unit = {
    if (batch.isEmpty) return
    GrowingIndex.commit(
      batch.select(col(idCol), col(vecCol)),
      Pca.batchStats(batch, vecCol, idCol, d),
      batchId, outDir, statsDir)
  }

  /** Start the streaming query: `vecs` is a streaming DataFrame with
    * `idCol` and `vecCol`. Checkpointed; replay after restart re-runs
    * processBatch idempotently (statistics are a pure function of the
    * batch, so the partition overwrite rewrites identical rows). */
  def start(vecs: DataFrame, vecCol: String, idCol: String, d: Int,
      outDir: String, statsDir: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, vecCol, idCol, d, outDir, statsDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Fit from the growing stats index — bit-identical to a batch
    * [[Pca.fit]] over the stream's whole accepted corpus. */
  def fitFromDir(spark: SparkSession, statsDir: String, k: Int = 4,
      iters: Int = 32): Pca.Model =
    Pca.fitFromStats(spark,
      spark.read.parquet(statsDir).select("stat", "idx", "val"), k, iters)
}
