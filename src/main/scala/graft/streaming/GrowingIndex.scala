package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared read/commit harness for the growing-parquet-index streaming
 * dedup operators ([[StreamingDedup]], [[StreamingSemdedup]]). Both
 * follow the same cycle per micro-batch — read the index of everything
 * accepted so far, dedup the batch against it, append survivors to the
 * corpus and their index rows to the index — and the crash-window
 * semantics of that cycle live HERE, once.
 *
 * Exactly-once: both relations are written as a dynamic overwrite of
 * the batch's OWN `batch_id=<id>` partition, never a blind append, so a
 * checkpoint replay of a half-committed batch REPLACES its partitions
 * instead of landing a second copy. Walking the crash windows:
 *  - crash before the corpus write: nothing on disk, full replay.
 *  - crash between the two writes: the replay sees the same index state
 *    as the first attempt (its own index partition was not yet
 *    committed), recomputes the identical survivor set, and overwrites
 *    the corpus partition with identical rows — then commits the index
 *    partition it was missing.
 *  - crash after both writes but before the checkpoint commit marker:
 *    the replayed batch dedups against its OWN index rows (dedup is
 *    content-keyed: a digest matches itself, a vector's ADC cosine to
 *    its own codes is ≈ 1), the survivor set is empty, and an empty
 *    dynamic overwrite touches no partitions — both relations keep
 *    exactly the first attempt's rows.
 *
 * Public surface: [[compact]] is the offline maintenance entry point
 * for users of either streaming operator; [[read]]/[[commit]] are the
 * per-batch cycle the operators drive.
 */
object GrowingIndex {

  /** Some(index) once a commit exists, None before the first one. The
    * filesystem is probed for the directory instead of pattern-matching
    * read exceptions, so a REAL read failure (corrupt footer, schema
    * drift) still propagates instead of silently disabling
    * dedup-against-history for the batch. */
  def read(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(indexDir))
    else {
      // A missing live dir with a `<dir>.old` sibling is NOT "no index
      // yet" — it is a compaction that died between its two renames.
      // Returning None here would silently dedup every batch against
      // nothing; fail loudly and tell the operator how to recover.
      val old = new org.apache.hadoop.fs.Path(indexDir + ".old")
      if (fs.exists(old)) throw new IllegalStateException(
        s"$indexDir is missing but $old exists: a compaction was " +
          s"interrupted mid-swap. Recover with `mv $old $indexDir` " +
          "before restarting the stream.")
      None
    }
  }

  /** Idempotently commit a processed micro-batch: `survivors` to the
    * corpus at `outDir`, `indexRows` to the index at `indexDir`, each
    * replacing only its own `batch_id=<id>` partition.
    * `indexSubCols` optionally sub-partitions the index INSIDE the
    * batch partition (e.g. the ANN coarse cell, so a probe's scan
    * prunes to its cell directories in every epoch) — batch_id stays
    * the leading partition column, so the dynamic overwrite still
    * replaces exactly the batch's own subtree. */
  def commit(survivors: DataFrame, indexRows: DataFrame, batchId: Long,
      outDir: String, indexDir: String,
      indexSubCols: Seq[String] = Nil): Unit = {
    def write(df: DataFrame, dir: String, sub: Seq[String]): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id" +: sub: _*)
        .parquet(dir)
    write(survivors, outDir, Nil)
    write(indexRows, indexDir, indexSubCols)
  }

  /** Partition id the compactor folds history into — negative so it can
    * never collide with a Structured Streaming batch id (those count up
    * from 0). */
  val CompactedBatchId: Long = -1L

  /** Offline maintenance for a long-lived stream: fold the
    * one-partition-per-epoch history (the small-files tail a year of
    * micro-batches leaves behind) of BOTH the corpus and the index into
    * `targetFiles` files under a single `batch_id=-1` partition each.
    * Run ONLY while the stream is stopped — the rewrite is not
    * coordinated with in-flight commits.
    *
    * The pair is compacted together because the replay-safety argument
    * needs a precondition only the pair can express: every corpus
    * batch partition must also have its index partition (a crash
    * between `commit`'s two writes leaves corpus ⊋ index — folding
    * that corpus partition away would let its replay land a SECOND
    * copy, since the index has no rows to dedup it against). The
    * precondition is checked and compaction refuses otherwise; restart
    * the stream once (the replay completes the half-committed batch)
    * and compact after a clean stop.
    *
    * With the precondition held, replay stays exactly-once: a batch
    * replayed after its partitions were folded away finds its own rows
    * under `batch_id=-1` in the index, dedups to an empty survivor
    * set, and an empty dynamic overwrite touches nothing. For
    * [[StreamingDedup]] that self-match is exact (md5 digests); for
    * [[StreamingSemdedup]] it is a vector's ADC cosine against its own
    * int8 codes — ≈ 0.999 for SQ8, so the argument holds for any
    * threshold below that self-reconstruction cosine (thresholds
    * within rounding of 1.0 are outside the compaction contract).
    *
    * Swap discipline, per dir: the compacted layout is written to a
    * sibling `<dir>.compacting`, the live dir is moved to `<dir>.old`,
    * the new one moved into place, and `.old` deleted — a crash
    * mid-swap leaves either the old layout live or recoverable at
    * `<dir>.old`, never nothing ([[read]] fails loudly on that state
    * instead of treating it as an empty index). A leftover `.old` from
    * a previous interrupted run blocks compaction rather than being
    * deleted — it may be the only copy. Rename atomicity is assumed
    * (local/HDFS); on an object store, where rename is copy+delete,
    * swap via the table catalog instead. Returns (corpusRows,
    * indexRows), both unchanged by compaction. */
  def compact(spark: SparkSession, outDir: String, indexDir: String,
      targetFiles: Int = 8, indexSubCols: Seq[String] = Nil): (Long, Long) = {
    require(targetFiles > 0, s"targetFiles=$targetFiles must be positive")
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hc)
    def batchIds(dir: String): Set[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).toSet
    val pending =
      batchIds(outDir) - CompactedBatchId -- batchIds(indexDir)
    require(pending.isEmpty,
      s"corpus batches ${pending.toSeq.sorted.mkString(", ")} have no " +
        "index partition (a crash between commit's two writes); restart " +
        "the stream to let the replay complete them, stop cleanly, then " +
        "compact")
    (compactOne(spark, fs, outDir, targetFiles),
      compactOne(spark, fs, indexDir, targetFiles, indexSubCols))
  }

  /**
   * RIGHT-TO-BE-FORGOTTEN on the growing corpus+index pair — deletion
   * propagation ([[graft.io.ParquetSink.deleteByKeys]], which rewrites
   * only partitions containing a doomed key) applied to BOTH relations
   * of a streaming dedup operator, in the one order that preserves the
   * exactly-once replay property: CORPUS first, index second. The
   * crash windows:
   *
   *  - crash inside either relation's rewrite: deleteByKeys itself
   *    leaves every partition either old or rewritten (never missing);
   *  - crash BETWEEN the two relations: corpus cleaned, index intact —
   *    the SAFE direction, because a retained fingerprint row can only
   *    cause future or replayed copies of the deleted content to be
   *    DROPPED, never resurrected (the reverse order would let a
   *    replayed batch re-admit content whose corpus rows still exist);
   *  - any interrupted state converges by RE-RUNNING the delete — the
   *    operation is idempotent (doomed keys are simply absent on the
   *    second pass).
   *
   * Run ONLY while the stream is stopped with its checkpoint committed
   * (the [[compact]] discipline): the keys' index rows are removed
   * too, so an UNcommitted in-flight batch containing a doomed key
   * would re-admit it on replay. Deletion is not a blocklist — a fresh
   * copy of the same content arriving in a future batch is new data by
   * definition; compose with the decontamination operators when a
   * durable content block is needed. Returns the surviving
   * (corpusRows, indexRows).
   */
  def deleteKeys(spark: SparkSession, outDir: String, indexDir: String,
      keyCol: String, keys: DataFrame): (Long, Long) = {
    graft.io.ParquetSink.deleteByKeys(spark, outDir, "batch_id", keyCol,
      keys)
    graft.io.ParquetSink.deleteByKeys(spark, indexDir, "batch_id", keyCol,
      keys)
    (survivorCount(spark, outDir), survivorCount(spark, indexDir))
  }

  /** [[deleteKeys]] for a SUB-PARTITIONED index layout (the ANN
    * `cluster` cells, the BM25 `bucket` dirs): the index rewrite
    * re-partitions by the full `batch_id` +: `indexSubCols` chain so
    * the serving-side partition pruning survives deletion. Same
    * corpus-FIRST ordering and crash-window argument as the flat
    * form. */
  def deleteKeysSub(spark: SparkSession, outDir: String, indexDir: String,
      keyCol: String, keys: DataFrame,
      indexSubCols: Seq[String]): (Long, Long) = {
    graft.io.ParquetSink.deleteByKeys(spark, outDir, "batch_id", keyCol,
      keys)
    graft.io.ParquetSink.deleteByKeys(spark, indexDir, "batch_id", keyCol,
      keys, subCols = indexSubCols)
    (survivorCount(spark, outDir), survivorCount(spark, indexDir))
  }

  /** Survivor count after a delete. A delete that dooms every remaining
    * key leaves the root with no batch_id partition dirs at all, and
    * `spark.read.parquet` on a partition-less directory throws (unable
    * to infer schema) AFTER the delete itself succeeded — an emptied
    * relation is simply 0 rows. */
  private def survivorCount(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isDirectory || n.endsWith(".parquet")
    }
    if (hasData) spark.read.parquet(dir).count() else 0L
  }

  private[streaming] def compactOne(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      targetFiles: Int, subCols: Seq[String] = Nil): Long = {
    val live = new org.apache.hadoop.fs.Path(dir)
    require(fs.exists(live), s"nothing to compact at $dir")
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compacting")
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    require(!fs.exists(old),
      s"$old left by an interrupted compaction — it may be the only " +
        s"copy; recover or remove it manually before compacting")
    fs.delete(tmp, true) // an incomplete .compacting is always safe to drop
    // sub-partitioned layouts (the ANN cell dirs) repartition BY the
    // sub-columns so the fold writes targetFiles files per sub-dir tree,
    // not targetFiles files × every open sub-partition
    val folded = spark.read.parquet(dir)
      .withColumn("batch_id", lit(CompactedBatchId))
    val arranged =
      if (subCols.isEmpty) folded.repartition(targetFiles)
      else folded.repartition(targetFiles, subCols.map(col): _*)
    arranged
      .write.mode("overwrite").partitionBy("batch_id" +: subCols: _*)
      .parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    require(fs.rename(live, old), s"compact: could not move $live aside")
    require(fs.rename(tmp, live), s"compact: could not move $tmp into place")
    fs.delete(old, true)
    n
  }
}
