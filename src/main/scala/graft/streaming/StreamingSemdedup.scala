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
 * Exactly-once: a crash between the two appends is healed by
 * checkpoint replay — a replayed batch re-dedups against its OWN index
 * rows (a vector's ADC cosine to its own codes is ≈1 ≥ threshold), so
 * survivors land once (proved in StreamsSpec's restart case, same
 * recipe as the text-dedup proof).
 */
object StreamingSemdedup {

  /** One micro-batch: batch-internal SemDeDup keepers, then dedup
    * against the stored index, then append survivors to `outDir` and
    * their compressed index rows to `indexDir`. */
  def processBatch(batch: DataFrame, vecCol: String, idCol: String,
      cents: Array[(Long, Array[Double], Double)], indexDir: String,
      outDir: String, threshold: Double): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val kept = SemanticDedup.keepers(batch, vecCol, idCol, cents, threshold)
      .filter(col("is_kept"))
      .select(col("vec_id").as(idCol))
    val internal = batch.join(kept, Seq(idCol), "left_semi")
    val index =
      try Some(spark.read.parquet(indexDir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val survivors = (index match {
      case Some(idx) => SemanticDedup.semdedupAgainstIndex(internal, idx,
        vecCol, idCol, cents, threshold)
      case None => internal
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      survivors.write.mode("append").parquet(outDir)
      SemanticDedup.corpusIndex(survivors, vecCol, idCol, cents)
        .write.mode("append").parquet(indexDir)
    } finally survivors.unpersist()
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, vecCol, idCol, cents, indexDir, outDir,
          threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
