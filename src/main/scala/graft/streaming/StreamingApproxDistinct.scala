package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming distinct-count tracking — per-epoch HyperLogLog register
 * PARTIALS grown under the [[GrowingIndex]] idempotent-overwrite
 * discipline, merged on read by register-wise max. The classic
 * streaming-metrics layout ("distinct users per event type, updated
 * per micro-batch"), built on the repo's DETERMINISTIC HLL
 * ([[graft.functions.HllRegisters]]): because the register merge is
 * commutative, associative and IDEMPOTENT, the merged registers equal
 * a single batch sketch over the full history — so the serve estimate
 * shares the batch query's oracle, and a replayed epoch (which
 * rewrites identical registers over itself) can never move a count.
 *
 * DELETION CONTRACT (right-to-be-forgotten): REBUILD-ONLY. The
 * register merge is an idempotent MAX — there is no compensation
 * epoch that can "un-max" a register, unlike the additive layouts
 * (BM25 df, soft-dedup counts) where negative tombstones subtract.
 * To forget items, drop the partials directory and re-sketch the
 * surviving corpus (one pass; the sketch is deterministic, so the
 * rebuild is reproducible). The estimate never exposes item
 * identities — the registers store only max leading-zero counts — but
 * a deleted item may still have contributed a register maximum, so a
 * strict erasure guarantee requires the rebuild.
 *
 * Scale shape: each epoch commits 2^p ints per group (a few KB);
 * serving folds epochs × 2^p rows per group — epoch-count work, never
 * item-grain. The raw items are NOT retained; this is the layout that
 * answers "how many distinct X so far" at 100 TB without ever
 * re-scanning history.
 */
object StreamingApproxDistinct {

  /** One micro-batch's partial: (grp, regs) per group, committed
    * idempotently under its own `batch_id` partition. */
  def processBatch(batch: DataFrame, batchId: Long, grpCol: String,
      itemCol: String, p: Int, outDir: String): Unit = {
    if (batch.isEmpty) return
    batch.select(col(grpCol).as("grp"), col(itemCol).cast("string").as("item"))
      .groupBy("grp")
      .agg(GraftFunctions.hll_registers(col("item"), p).as("regs"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
  }

  /** Start the stream: `rows` is a streaming DataFrame with `grpCol`
    * and `itemCol`. Checkpointed; replays rewrite identical register
    * partials (sketching is deterministic). */
  def start(rows: DataFrame, grpCol: String, itemCol: String, p: Int,
      outDir: String, checkpointDir: String): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, grpCol, itemCol, p, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Merged registers across all epochs: (grp, regs) with regs the
    * register-wise max — equal to a single sketch over the full
    * history by max-merge associativity/idempotence. Epoch-count ×
    * 2^p work per group. */
  def mergedRegisters(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .select(col("grp"), posexplode(col("regs")).as(Seq("pos", "r")))
      .groupBy("grp", "pos").agg(max(col("r")).as("r"))
      .groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("r")))),
        x => x.getField("r")).as("regs"))

  /** The running estimate per group from the growing partials. */
  def estimate(spark: SparkSession, outDir: String, p: Int): DataFrame =
    mergedRegisters(spark, outDir)
      .select(col("grp"),
        GraftFunctions.hll_estimate(col("regs"), p).as("n_est"))
}
