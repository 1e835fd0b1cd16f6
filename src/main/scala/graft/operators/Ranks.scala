package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed exact ranking over LOW-CARDINALITY group keys — the
 * scale-safe formulation of `percent_rank()/cume_dist()/ntile()` windows.
 *
 * `Window.partitionBy(segment)` over a 5-value key funnels the whole
 * table through 5 tasks no matter the cluster size. This operator
 * computes the identical ranks in two passes, neither of which ever
 * materializes a whole group in one task:
 *
 *  1. bucket every row by a caller-supplied expression MONOTONE in the
 *     first order column (e.g. `floor(value/100)`); a hash-agg counts
 *     rows per (group, bucket) — map-side combinable, any parallelism;
 *  2. a prefix sum over the tiny (groups × buckets) count table gives
 *     each bucket its global offset; rows then take
 *     `offset + row_number()` inside their (group, bucket) — the window
 *     partition is now a BUCKET, whose size is bounded by bucket
 *     granularity, not by group size.
 *
 * The ordering must be made unique by the caller (tie-break columns),
 * exactly as the oracle-portable window queries already require.
 * Results are bit-identical to the single-partition window.
 */
object Ranks {

  /** ntile(k) from a precomputed unique rank and group size — the SQL
    * standard's bucket assignment (first n%k tiles get one extra row). */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val base = (n / k).cast("long")          // rows per small tile
    val rem = n % k                          // tiles with base+1 rows
    val bigSpan = rem * (base + 1)           // rows covered by big tiles
    when(base === 0, rank) // n < k: one row per tile
      .when(rank <= bigSpan, ((rank - 1) / (base + 1) + 1))
      .otherwise(rem + (rank - bigSpan - 1) / base + 1)
      .cast("int")
  }

  /**
   * Adds `__rank` (1-based, dense in the unique ordering) and `__n`
   * (group size) to `df`, ranked within `groupCol` by
   * (`orderCol`, `tieCols…`) ascending. `bucketExpr` must be monotone
   * non-decreasing in `orderCol` (same value ⇒ same bucket is fine).
   */
  def withRank(df: DataFrame, groupCol: String, orderCol: String,
      tieCols: Seq[String], bucketExpr: Column): DataFrame = {
    val b = df.withColumn("__b", bucketExpr.cast("long"))
    // pass 1: per-(group, bucket) counts — tiny output (groups × buckets)
    val cnt = b.groupBy(groupCol, "__b").agg(count(lit(1)).as("__c"))
    // prefix sum over the count table: rows BELOW each bucket. The window
    // here runs over the aggregated table (bounded by design-time bucket
    // count), not over the data.
    val below = cnt.withColumn("__below",
        sum(col("__c")).over(
          Window.partitionBy(groupCol).orderBy("__b")) - col("__c"))
      .select(col(groupCol), col("__b"), col("__below"))
    val n = b.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    // pass 2: local rank inside the (group, bucket) cell + global offset
    val local = Window.partitionBy(groupCol, "__b")
      .orderBy((orderCol +: tieCols).map(col): _*)
    // No broadcast() hint: the offset table is groups × buckets and the
    // bucket count is CALLER-controlled (an unbounded value domain with
    // a fine bucketExpr can make it arbitrarily large), so a forced
    // broadcast has no fail-fast guard against exceeding the driver /
    // broadcast limit. AQE still promotes both joins to broadcast
    // whenever the tables are actually small — same policy as the
    // dedup keptCnt join.
    b.join(below, Seq(groupCol, "__b"))
      .join(n, Seq(groupCol))
      .withColumn("__rank", col("__below") + row_number().over(local))
      .drop("__b", "__below", "__c")
  }

  /**
   * percent_rank / cume_dist / ntile(k) within `groupCol` ordered by the
   * UNIQUE key (`orderCol`, `tieCols…`) — same values as the
   * corresponding window functions, computed via [[withRank]] so no task
   * ever holds a whole group. With a unique ordering every row is its
   * own peer group, so cume_dist = rank/n and percent_rank =
   * (rank−1)/(n−1).
   */
  def percentiles(df: DataFrame, groupCol: String, orderCol: String,
      tieCols: Seq[String], bucketExpr: Column, k: Int): DataFrame =
    withRank(df, groupCol, orderCol, tieCols, bucketExpr)
      .withColumn("pr",
        when(col("__n") === 1, lit(0.0))
          .otherwise(round((col("__rank") - 1).cast("double") /
            (col("__n") - 1), 6)))
      .withColumn("cd",
        round(col("__rank").cast("double") / col("__n"), 6))
      .withColumn("quartile", ntileFromRank(col("__rank"), col("__n"), k))
      .drop("__rank", "__n")
}
