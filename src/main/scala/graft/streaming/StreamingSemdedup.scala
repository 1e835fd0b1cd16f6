package graft.streaming

import graft.embeddings.SemanticDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental SEMANTIC dedup — [[StreamingDedup]]'s
 * growing-index pattern applied to embeddings: each micro-batch is
 * SemDeDup'ed internally (keeper rule within the batch's clusters),
 * then against the PERSISTED index of everything accepted so far;
 * survivors are appended to both the corpus output and the index.
 *
 * Scale shape: the index holds one (cluster, vec_id, scale, q) row per
 * accepted vector — int8 codes, the same ~4×-compressed layout
 * `writeIvfSq8Index` persists — and each batch probe joins only on the
 * batch's own clusters, so work is linear in the batch and never
 * quadratic in history. Centroids are FIXED for the stream's lifetime
 * (passed in, e.g. from `kmeansCentroids` over a bootstrap corpus):
 * cluster ids must mean the same thing in every epoch, exactly like the
 * minhash permutations in [[StreamingDedup]].
 *
 * Exactly-once: both relations are committed per batch via
 * [[GrowingIndex.commit]] — a dynamic overwrite of the batch's own
 * `batch_id` partition, idempotent in EVERY crash window (the
 * crash-after-both-writes window additionally relies on a replayed
 * vector ADC-matching its own codes, cosine ≈ 1 ≥ threshold; see the
 * harness doc for the full case walk; StreamsSpec's restart case
 * proves the replay, same recipe as the text-dedup proof).
 */
object StreamingSemdedup {

  /** One micro-batch: batch-internal SemDeDup keepers, then dedup
    * against the stored index, then commit survivors to `outDir` and
    * their compressed index rows to `indexDir` (idempotent per
    * `batchId` — [[GrowingIndex.commit]]). */
  def processBatch(batch: DataFrame, batchId: Long, vecCol: String,
      idCol: String, cents: Array[(Long, Array[Double], Double)],
      indexDir: String, outDir: String, threshold: Double): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val kept = SemanticDedup.keepers(batch, vecCol, idCol, cents, threshold)
      .filter(col("is_kept"))
      .select(col("vec_id").as(idCol))
    val internal = batch.join(kept, Seq(idCol), "left_semi")
    val survivors = (GrowingIndex.read(spark, indexDir) match {
      case Some(idx) => SemanticDedup.semdedupAgainstIndex(internal, idx,
        vecCol, idCol, cents, threshold)
      case None => internal
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try GrowingIndex.commit(survivors,
      SemanticDedup.corpusIndex(survivors, vecCol, idCol, cents),
      batchId, outDir, indexDir)
    finally survivors.unpersist()
  }

  /** Start the streaming query: `vecs` is a streaming DataFrame with
    * `idCol` and `vecCol`. Checkpointed; batch replay after restart
    * re-runs processBatch idempotently (replayed vectors dedup against
    * their own index rows). */
  def start(vecs: DataFrame, vecCol: String, idCol: String,
      cents: Array[(Long, Array[Double], Double)], indexDir: String,
      outDir: String, checkpointDir: String,
      threshold: Double = 0.9): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, vecCol, idCol, cents, indexDir,
          outDir, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
