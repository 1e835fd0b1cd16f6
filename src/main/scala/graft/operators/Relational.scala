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
}
