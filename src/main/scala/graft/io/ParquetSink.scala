package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Partitioned parquet layout — the lake-side sink for the engine
 * (SURVEY.md §2.1 S5 extension; the reference writes flat CSV/Postgres).
 *
 * Directory partitioning is the 100 TB table layout: readers with a
 * predicate on the partition column scan only matching directories
 * (partition pruning, visible as `PartitionFilters` in the scan node),
 * and dynamic partition overwrite replaces only the partitions present
 * in the incoming frame — the idempotent daily-backfill write.
 */
object ParquetSink {

  /** Write `df` partitioned by `partitionCols`. With mode=overwrite,
    * only partitions present in `df` are replaced (dynamic overwrite),
    * so re-running a day's backfill never clobbers other days. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: String = "overwrite"): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode(mode)
      .parquet(path)

  /**
   * Sort-clustered parquet layout — the second pruning axis after
   * directory partitioning: `repartitionByRange(sortCols)` then a
   * within-partition sort before the write, so each output file (and
   * each parquet ROW GROUP inside it) covers a narrow, disjoint range
   * of the sort key. Parquet stores per-row-group min/max statistics;
   * a point or range predicate on the sort key then skips whole files
   * and row groups at scan time (visible as `PushedFilters` plus the
   * scan's "number of files/row groups read" metrics collapsing), the
   * same lever as a clustered index — for a 100 TB fact table sorted
   * by e.g. (date, customer), a single-key lookup touches a handful of
   * row groups instead of the whole table. Range repartitioning
   * samples the key distribution, so skew in the sort key yields
   * balanced files rather than one giant hot file.
   */
  def writeSortedBy(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int, mode: String = "overwrite"): Unit = {
    require(sortCols.nonEmpty, "writeSortedBy needs at least one sort column")
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }

  /**
   * Z-ordered parquet layout: [[writeSortedBy]] on the Morton
   * interleaving of two keys ([[graft.operators.ZOrder.zValue]]), so
   * min/max skipping works for predicates on EITHER key — the
   * two-dimensional clustering lever (Delta/Iceberg OPTIMIZE ZORDER)
   * for a 100 TB fact table queried by both date and customer.
   *
   * Both keys are first min/max-scaled to `scaleBits` bits with pure
   * integer arithmetic — interleaving RAW keys of different magnitudes
   * is the classic z-order mistake: a 13-bit key interleaved with an
   * 8-bit key puts every top z bit on the wide key and the layout
   * degenerates to a one-column sort (caught by the span-fraction
   * spec). The 1-row bounds aggregate broadcasts; no collect. The z
   * column is kept in the files (readers may range-prune on it
   * directly).
   */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int, zCol: String = "z",
      mode: String = "overwrite", scaleBits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col, expr, max, min}
    require(scaleBits >= 1 && scaleBits <= 31, "scaleBits in [1, 31]")
    val bounds = df.agg(min(col(colA)).as("__alo"), max(col(colA)).as("__ahi"),
      min(col(colB)).as("__blo"), max(col(colB)).as("__bhi"))
    val top = (1L << scaleBits) - 1
    val scaled = df.crossJoin(broadcast(bounds))
      .withColumn("__za",
        expr(s"(($colA - __alo) * $top) DIV greatest(__ahi - __alo, 1)"))
      .withColumn("__zb",
        expr(s"(($colB - __blo) * $top) DIV greatest(__bhi - __blo, 1)"))
      .withColumn(zCol,
        graft.operators.ZOrder.zValue(col("__za"), col("__zb"), scaleBits))
      .drop("__za", "__zb", "__alo", "__ahi", "__blo", "__bhi")
    writeSortedBy(scaled, path, Seq(zCol), numFiles, mode)
  }

  /**
   * DELETION PROPAGATION over a partitioned parquet table — the
   * right-to-be-forgotten / takedown pass a training-data lake must run
   * without rewriting 100 TB: only partitions that actually CONTAIN a
   * doomed key are rewritten (their survivors re-written via dynamic
   * partition overwrite), every other partition's files are left
   * byte-untouched; partitions whose every row is deleted have their
   * directories removed outright.
   *
   * Scale shape: the key set broadcasts (one semi-join finds affected
   * partitions, one anti-join drops doomed rows — both pushed to the
   * scan's partition filter on the second pass, so only affected
   * directories are re-read). The only driver state is the affected
   * PARTITION-VALUE list — bounded by partition cardinality, an
   * operational constant (a date/lang/source column), not by data size.
   * The survivors are `localCheckpoint`ed before the write because
   * Spark refuses to overwrite a path its plan still reads.
   *
   * Crash-safety: the rewrite happens before empty-directory removal,
   * so every crash window leaves either the old partition or the
   * rewritten one, and a re-run converges (the delete is idempotent:
   * doomed keys are simply absent the second time).
   */
  def deleteByKeys(spark: SparkSession, path: String, partitionCol: String,
      keyCol: String, keys: DataFrame,
      subCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    // `subCols` names the layout's SUB-partition columns inside each
    // `partitionCol` partition (the ANN index's `cluster`, the BM25
    // index's `bucket`) — the rewrite must re-partition by the FULL
    // column chain or the rewritten partitions would come back flat,
    // demoting the sub-column to data and breaking both partition
    // discovery (mixed layouts under one root) and serve-side pruning.
    val pcols = partitionCol +: subCols
    val table = spark.read.parquet(path)
    val doomed = broadcast(keys.select(col(keyCol)).distinct())
    val affectedLeaves = table.join(doomed, Seq(keyCol), "left_semi")
      .select(pcols.map(col): _*).distinct().collect().map(_.toSeq)
    require(affectedLeaves.forall(_.forall(_ != null)),
      "deleteByKeys requires non-null partition values (isin-based " +
        "partition addressing cannot match the null partition)")
    if (affectedLeaves.isEmpty) return
    val affectedBatches = affectedLeaves.map(_.head).distinct
    val surviving = table
      .filter(col(partitionCol).isin(affectedBatches: _*))
      .join(doomed, Seq(keyCol), "left_anti")
      .localCheckpoint(true)
    val survivorLeaves = surviving.select(pcols.map(col): _*).distinct()
      .collect().map(_.toSeq).toSet
    val survivorBatches = survivorLeaves.map(_.head)
    if (survivorLeaves.nonEmpty)
      writePartitioned(surviving.filter(
        col(partitionCol).isin(survivorBatches.toSeq: _*)), path, pcols)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // escape values exactly as Spark's writer escaped the directory
    // names (spaces, slashes, '%', … are percent-encoded on write — a
    // raw interpolation would silently miss those directories)
    def dirOf(vals: Seq[Any], cols: Seq[String]): org.apache.hadoop.fs.Path =
      cols.zip(vals).foldLeft(new org.apache.hadoop.fs.Path(path)) {
        case (p, (c, v)) => new org.apache.hadoop.fs.Path(p,
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(c, String.valueOf(v)))
      }
    // partitions whose every row was doomed get no dynamic overwrite —
    // remove them explicitly: whole batches with no survivors at all,
    // then doomed-only LEAVES inside batches that kept other leaves
    (affectedBatches.toSet -- survivorBatches).foreach(b =>
      fs.delete(dirOf(Seq(b), Seq(partitionCol)), true))
    if (subCols.nonEmpty)
      affectedLeaves
        .filter(l => survivorBatches.contains(l.head))
        .filterNot(survivorLeaves.contains)
        .foreach(l => fs.delete(dirOf(l, pcols), true))
  }
}
