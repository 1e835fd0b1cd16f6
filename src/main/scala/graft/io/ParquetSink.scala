package graft.io

import org.apache.spark.sql.DataFrame

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
}
