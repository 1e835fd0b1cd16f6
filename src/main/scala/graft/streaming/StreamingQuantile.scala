package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming percentile tracking — per-epoch bottom-k quantile-sample
 * PARTIALS ([[graft.functions.QuantileSketchPartial]]) grown under the
 * [[GrowingIndex]] idempotent-overwrite discipline, merged on read by
 * flatten → (hash, value) sort → first k. The companion of
 * [[StreamingApproxDistinct]] for the other standing profile metric:
 * "what is the p99 of this signal so far".
 *
 * Exactly-once: an epoch replay REWRITES its own `batch_id` partition
 * (sketching is deterministic), so the merge-on-read never sees a row
 * twice; and because an element of the global bottom-k is in its
 * epoch's bottom-k, the merged sample EQUALS the single batch sketch
 * over the full history — the batch query's oracle is the gate.
 * (Disjoint epochs are also what licenses the merge itself — see the
 * precondition on [[graft.functions.QuantileSample.merge]].)
 *
 * DELETION CONTRACT (right-to-be-forgotten): REBUILD-ONLY — the
 * [[StreamingApproxDistinct]] precedent, for the same structural
 * reason. An epoch partial is a TRUNCATED bottom-k: rows outside the
 * k smallest were discarded at commit time, so no compensation epoch
 * can re-surface them. A deleted row may occupy an epoch's bottom-k —
 * filtering its (h, v) entry out of the partials leaves the slot
 * empty instead of refilling it with the survivor it crowded out, so
 * the merged sample under-represents survivors near the boundary and
 * the estimate biases high. Unlike the additive layouts (BM25 df,
 * soft-dedup counts), there is no negative-tombstone path: to forget
 * items, drop the partials directory and re-sketch the surviving
 * corpus (one pass; the sketch is deterministic, so the rebuild is
 * reproducible). Pinned by `QuantileSketchSpec`'s deletion spec.
 *
 * Scale shape: each epoch commits ≤ k (h, v) pairs per group (16·k
 * bytes); serving folds epochs × k rows per group — epoch-count work,
 * never item-grain, the layout that answers percentile questions at
 * 100 TB without re-scanning history.
 */
object StreamingQuantile {

  /** One micro-batch's partial: (grp, sample) per group, committed
    * idempotently under its own `batch_id` partition. */
  def processBatch(batch: DataFrame, batchId: Long, grpCol: String,
      valueCol: String, keyCol: String, k: Int, outDir: String): Unit = {
    if (batch.isEmpty) return
    batch.select(col(grpCol).as("grp"),
      col(valueCol).cast("double").as("v"),
      col(keyCol).cast("string").as("key"))
      .groupBy("grp")
      .agg(GraftFunctions.quantile_sketch_partial(col("v"), col("key"), k)
        .as("sample"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
  }

  /** Start the stream: `rows` is a streaming DataFrame. Checkpointed;
    * replays rewrite identical partials (sketching is deterministic). */
  def start(rows: DataFrame, grpCol: String, valueCol: String,
      keyCol: String, k: Int, outDir: String,
      checkpointDir: String): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, grpCol, valueCol, keyCol, k, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The merged sample per group across all epochs — equal to one
    * batch sketch over the full history. */
  def mergedSample(spark: SparkSession, outDir: String, k: Int): DataFrame =
    spark.read.parquet(outDir)
      .groupBy("grp")
      .agg(GraftFunctions.quantile_merge(collect_list(col("sample")), k)
        .as("sample"))
}
