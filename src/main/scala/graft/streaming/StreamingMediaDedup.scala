package graft.streaming

import graft.dedup.TextDedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental MEDIA dedup — the multimodal sibling of
 * [[StreamingDedup]]: each micro-batch of binary payloads is
 * fingerprinted (image dHash or audio envelope — caller-selected), the
 * batch deduplicates internally (exact fingerprint, keep min id) and
 * against the PERSISTED fingerprint index of everything accepted so
 * far (Hamming ≤ maxDist via the same wide-key banding the batch
 * operators use — exact pigeonhole recall), and survivors commit to
 * both the corpus output and the index through the shared
 * exactly-once harness ([[GrowingIndex.commit]] — dynamic overwrite of
 * the batch's own partition, idempotent in every crash window).
 *
 * Scale shape: the index holds ONE (doc_id, fp) long per accepted
 * asset; each batch's probe joins DISTINCT fingerprints against
 * distinct stored fingerprints on the banding keys — linear in the
 * batch, never quadratic in history. Near-dup matching against history
 * is deliberately one-directional (a new asset within maxDist of a
 * STORED one is dropped), mirroring the text operator's
 * accept-first-seen policy.
 */
object StreamingMediaDedup {

  /** Fingerprint kinds this harness can grow an index for.
    * [[AudioWindowed]] is the SHIFT-TOLERANT kind: one row per
    * (clip, window offset) — the index grows by clipLen/hop rows per
    * accepted asset (the standard fingerprint-density trade), and a
    * time-shifted copy of stored history collides at Hamming 0 where
    * [[AudioEnvelope]]'s positional whole-clip hash misses it. */
  sealed trait Fingerprint
  case object ImageDhash extends Fingerprint
  case object AudioEnvelope extends Fingerprint
  final case class AudioWindowed(window: Int = 64, hop: Int = 16)
    extends Fingerprint

  private def fingerprints(batch: DataFrame, binCol: String, idCol: String,
      kind: Fingerprint): DataFrame = kind match {
    case ImageDhash =>
      Multimodal.imageDhash(batch, binCol, idCol)
        .withColumnRenamed("dhash", "fp")
    case AudioEnvelope =>
      Multimodal.audioFingerprint(batch, binCol, idCol)
        .withColumnRenamed("afp", "fp")
    case AudioWindowed(w, h) =>
      Multimodal.audioWindowedFingerprints(batch, binCol, idCol, w, h)
        .select(col("doc_id"), col("afp").as("fp"))
  }

  /** One micro-batch: fingerprint → batch-internal exact dedup (keep
    * min id) → Hamming-banded near-dup check against the stored index →
    * commit survivors + their (doc_id, fp) index rows (idempotent per
    * `batchId`). Payloads that decode to no fingerprint pass through
    * unmatched (they carry no dedup evidence) but are NOT indexed —
    * their replay safety comes from the per-batch partition overwrite
    * alone, not index self-match, so [[GrowingIndex.compact]]'s
    * replay-after-fold argument covers only the fingerprinted rows;
    * the compactor's clean-stop precondition (no replayable batches at
    * compaction time) is what protects passthroughs, exactly as
    * documented there. */
  def processBatch(batch: DataFrame, batchId: Long, binCol: String,
      idCol: String, indexDir: String, outDir: String,
      kind: Fingerprint = ImageDhash, maxDist: Int = 2): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fps = fingerprints(batch, binCol, idCol, kind)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // batch-internal dedup, multi-fingerprint-safe: a doc drops when
      // ANY of its fingerprints is owned (min doc id) by a smaller doc
      // — for one-fp-per-doc kinds this is exactly the old keep-the-
      // fp-minimum rule; for windowed audio it also catches a batch-
      // internal time-shifted copy (which shares windows with the
      // original but ALSO carries unique lead-in windows it owns).
      val minOwner = fps.groupBy("fp").agg(min(col("doc_id")).as("__own"))
      val dropped = fps.join(minOwner, "fp")
        .where(col("doc_id") > col("__own"))
        .select("doc_id").distinct()
      val internal = fps.join(dropped, Seq("doc_id"), "left_anti")
      val survivorFps = GrowingIndex.read(spark, indexDir) match {
        case Some(idx) =>
          val matched = TextDedup.hammingMatchedIds(internal, "doc_id",
            "fp", idx, "fp", maxDist, chunkBits = 16)
          internal.join(matched, Seq("doc_id"), "left_anti")
        case None => internal
      }
      // survivors = fingerprinted keepers + undecodable passthroughs
      val decodedIds = fps.select("doc_id")
      val keepIdSet = survivorFps.select("doc_id")
        .unionByName(
          batch.select(col(idCol).cast("long").as("doc_id"))
            .join(decodedIds, Seq("doc_id"), "left_anti"))
        .withColumnRenamed("doc_id", "__keep_id")
      val survivors = batch.join(keepIdSet,
        batch(idCol).cast("long") === keepIdSet("__keep_id"), "left_semi")
      GrowingIndex.commit(survivors, survivorFps, batchId, outDir, indexDir)
    } finally fps.unpersist()
  }

  /** Start the streaming query (checkpointed foreachBatch — replayed
    * batches re-commit their own partitions, see [[GrowingIndex]]). */
  def start(media: DataFrame, binCol: String, idCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      kind: Fingerprint = ImageDhash, maxDist: Int = 2): StreamingQuery =
    media.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, binCol, idCol, indexDir, outDir,
          kind, maxDist)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
