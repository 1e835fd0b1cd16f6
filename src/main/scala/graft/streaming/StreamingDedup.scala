package graft.streaming

import graft.dedup.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental corpus dedup — the steady-state ingest shape for
 * a growing training corpus: each micro-batch is deduplicated (exact +
 * MinHash near-dup) against the PERSISTED index of everything accepted
 * so far, survivors are appended to both the corpus output and the
 * index. `foreachBatch` is the right tool because each batch needs two
 * writes (corpus + index) plus a read of the index — a plain streaming
 * sink can't express the read-modify-append cycle.
 *
 * Scale shape: the index holds one (doc_id, digest, hs) row per
 * accepted document ([[TextDedup.corpusIndex]]); each batch does one
 * semi-join on 16-byte digests and one banded join — linear in the
 * batch, never quadratic in history. The index parquet grows by one
 * `batch_id` partition per epoch; fold the small-files tail with
 * [[GrowingIndex.compact]] (offline, replay-safe) when index read
 * time matters. Exactly-once: both relations are
 * committed per batch via [[GrowingIndex.commit]] — dynamic overwrite
 * of the batch's own partition, idempotent in every crash window (see
 * the harness doc for the case walk).
 */
object StreamingDedup {

  /** One micro-batch: batch-internal exact dedup (keep min id), then
    * dedup against the stored index, then commit survivors to
    * `outDir` and their index rows to `indexDir` (idempotent per
    * `batchId` — [[GrowingIndex.commit]]). */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
      idCol: String, indexDir: String, outDir: String, n: Int = 3,
      numPerms: Int = 32, bandRows: Int = 0,
      threshold: Double = 0.8): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val keepIds = batch.groupBy(md5(col(textCol)).as("__dg"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val internal = batch.join(keepIds, Seq(idCol), "left_semi")
    val survivors = (GrowingIndex.read(spark, indexDir) match {
      case Some(idx) => TextDedup.dedupAgainstIndex(internal, idx,
        textCol, idCol, n, numPerms, bandRows, threshold)
      case None => internal
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try GrowingIndex.commit(survivors,
      TextDedup.corpusIndex(survivors, textCol, idCol, n),
      batchId, outDir, indexDir)
    finally survivors.unpersist()
  }

  /** Start the streaming query: `docs` is a streaming DataFrame with
    * `idCol` and `textCol`. Checkpointed, so batch replay after restart
    * re-runs processBatch (idempotent w.r.t. dedup: replayed documents
    * dedup against their own index rows). */
  def start(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      n: Int = 3, numPerms: Int = 32, bandRows: Int = 0,
      threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, idCol, indexDir, outDir,
          n, numPerms, bandRows, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
