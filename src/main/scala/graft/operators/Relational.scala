package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic relational operators beyond plain DataFrame methods — the
 * window/dedup/top-k family the reference engine implements with driver
 * loops and DISTINCT ON (reference: src/transform/entity_match.py:143-220,
 * src/load/upsert_logic.py:43-45, dbt/models/marts/dim_companies.sql:15-34).
 */
object Relational {

  /**
   * Top-k rows per group with a deterministic rank column.
   *
   * Scale note: Spark's window `row_number` sorts each partition of the
   * shuffle; with AQE the skewed-group case still lands on one task. For
   * small k over huge groups prefer [[argmaxPerKey]] (k=1) which avoids
   * the sort entirely.
   */
  def topKPerGroup(df: DataFrame, keys: Seq[String],
      ordering: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Keep the row with the maximum `orderCols` per key — one hash
    * aggregation (map-side combine), no sort. Ties must be broken by the
    * caller including a unique column last in `orderCols`. */
  def argmaxPerKey(df: DataFrame, keys: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), struct(orderCols: _*)).as("_r"))
      .select(keys.map(col) ++ others.map(c => col(s"_r.$c").as(c)): _*)
      .select(df.columns.map(col): _*)
  }

  /** Latest row per key by a timestamp column (ties → largest tieCol). */
  def latestPerKey(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String): DataFrame =
    argmaxPerKey(df, keys, Seq(col(tsCol), col(tieCol)))

  /** Rows of `left` with no partner in `right` (the NOT IN / anti-join
    * shape — dim_companies.sql:37-61). Null-safe: uses left_anti which at
    * scale becomes a shuffle (or broadcast) anti hash join. */
  def without(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame =
    left.join(right.select(col(rightKey)).distinct(),
      left(leftKey) === col(rightKey), "left_anti")

  /**
   * Left as-of join: each left row gets the right row with the largest
   * `rightTs` ≤ its `leftTs` (strictly < when allowExact=false) within
   * the same key group; no match → nulls. Right non-key columns are
   * appended (rename them before the call to avoid collisions).
   *
   * Implementation is the union + ordered-window formulation: tag the two
   * sides, sort each key group once by (ts, side), and carry the latest
   * right payload forward with last(ignoreNulls). ONE shuffle on the key
   * and one per-partition sort — the scalable shape for time-series
   * enrichment, vs. a range-condition join which Spark executes as a
   * per-key cross product. Right rows sharing an exact (key, ts) must be
   * unique per key+ts for deterministic output (true for event streams
   * with high-resolution timestamps).
   */
  /**
   * Range (interval-containment) join: left rows paired with right rows
   * whose [startCol, endCol] interval contains the left `tsCol`, equi on
   * `keys`.
   *
   * Implementation: right intervals are exploded into coarse time buckets
   * of `bucketSeconds` and the join runs equi on (keys, bucket) before the
   * exact containment filter — a banded range join. Spark executes a raw
   * `l.ts BETWEEN r.s AND r.e` predicate as a per-key nested loop
   * (BroadcastNestedLoopJoin at worst); bucketing restores a hash join
   * whose fan-out is bounded by interval_length / bucketSeconds + 1.
   * Pick bucketSeconds near the typical interval length.
   */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600): DataFrame = {
    val b = lit(bucketSeconds)
    // casts tolerate TIMESTAMP_NTZ inputs (naive parquet timestamps);
    // session timezone is pinned to UTC so the epoch value is unchanged
    val lb = left.withColumn("_bucket",
      floor(unix_timestamp(col(tsCol).cast("timestamp")) / b))
    val rb = right.withColumn("_bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol).cast("timestamp")) / b),
        floor(unix_timestamp(col(endCol).cast("timestamp")) / b))))
    lb.join(rb, keys :+ "_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      allowExact: Boolean = true): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(keys.contains)
    val leftSide = if (allowExact) 1 else 0
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(leftSide).as("_side"),
        struct(left.columns.map(col): _*).as("_lv"),
        lit(null).cast(right.select(
          struct(rightPayloadCols.map(col): _*)).schema.head.dataType)
          .as("_rv")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast(left.schema(leftTs).dataType).as("_ts"),
        lit(1 - leftSide).as("_side"),
        lit(null).cast(left.select(
          struct(left.columns.map(col): _*)).schema.head.dataType).as("_lv"),
        struct(rightPayloadCols.map(col): _*).as("_rv")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === leftSide && col("_lv").isNotNull)
      .select(left.columns.map(c => col(s"_lv.$c").as(c)) ++
        rightPayloadCols.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
