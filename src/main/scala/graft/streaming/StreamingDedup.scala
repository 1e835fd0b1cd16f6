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
 * batch, never quadratic in history. The index parquet grows
 * append-only; compact/bucket it offline when band-join read time
 * matters. Exactly-once caveat: a crash between the two appends can
 * leave one batch's survivors in the corpus but not the index (or vice
 * versa) — idempotent re-ingest of the affected batch restores
 * consistency because dedup is content-keyed.
 */
object StreamingDedup {

  /** One micro-batch: batch-internal exact dedup (keep min id), then
    * dedup against the stored index, then append survivors to
    * `outDir` and their index rows to `indexDir`. */
  def processBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, outDir: String, n: Int = 3, numPerms: Int = 32,
      bandRows: Int = 4, threshold: Double = 0.8): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val keepIds = batch.groupBy(md5(col(textCol)).as("__dg"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val internal = batch.join(keepIds, Seq(idCol), "left_semi")
    val index =
      try Some(spark.read.parquet(indexDir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val survivors = (index match {
      case Some(idx) => TextDedup.dedupAgainstIndex(internal, idx,
        textCol, idCol, n, numPerms, bandRows, threshold)
      case None => internal
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      survivors.write.mode("append").parquet(outDir)
      TextDedup.corpusIndex(survivors, textCol, idCol, n)
        .write.mode("append").parquet(indexDir)
    } finally survivors.unpersist()
  }

  /** Start the streaming query: `docs` is a streaming DataFrame with
    * `idCol` and `textCol`. Checkpointed, so batch replay after restart
    * re-runs processBatch (idempotent w.r.t. dedup: replayed documents
    * dedup against their own index rows). */
  def start(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      n: Int = 3, numPerms: Int = 32, bandRows: Int = 4,
      threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, textCol, idCol, indexDir, outDir,
          n, numPerms, bandRows, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
