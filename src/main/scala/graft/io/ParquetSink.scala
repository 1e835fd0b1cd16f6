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
}
