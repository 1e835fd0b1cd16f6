package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality assertions — the reference's dbt test layer
 * (dbt/tests/ and dbt/models/ schema.yml files) as Spark checks.
 * Each check returns the VIOLATING rows (empty = pass), mirroring dbt's
 * convention that a test query returning rows fails.
 */
object Quality {

  /** assert_no_duplicate_abns.sql: ABNs appearing more than once. */
  def duplicateAbns(dim: DataFrame): DataFrame =
    dim.groupBy("abn").agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** assert_valid_confidence_scores.sql: scores outside [0,1] or null. */
  def invalidConfidence(dim: DataFrame,
      scoreCol: String = "match_confidence_score"): DataFrame =
    dim.filter(col(scoreCol).isNull ||
      col(scoreCol) < 0.0 || col(scoreCol) > 1.0)

  /** assert_minimum_match_rate.sql: fails (returns one row) when
    * matches/web < minRate. */
  def belowMatchRate(web: DataFrame, matches: DataFrame,
      minRate: Double = 0.20): DataFrame = {
    val rate = matches.agg(count(lit(1))).crossJoin(web.agg(count(lit(1))))
      .toDF("m", "w")
      .select((col("m") / col("w")).as("match_rate"))
    rate.filter(col("match_rate") < minRate)
  }

  /** accepted_values checks (schema.yml): rows whose column value is
    * outside the allowed set (nulls pass, as in dbt). */
  def notAccepted(df: DataFrame, column: String, allowed: Seq[String]): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isInCollection(allowed))

  /** accepted_range check (dbt_utils.accepted_range). */
  def outOfRange(df: DataFrame, column: String,
      lo: Double, hi: Double): DataFrame =
    df.filter(col(column).isNotNull &&
      (col(column) < lo || col(column) > hi))

  /** Source-freshness check (dbt sources.yml:27-29: `warn_after` 24 h,
    * `error_after` 48 h on the web source's load timestamp): one row with
    * the source name, max(timestampCol), its age in hours relative to
    * `asOf` (default now; pass a literal for deterministic tests/oracles)
    * and pass/warn/error. An empty or all-null timestamp column is an
    * error, as in dbt. */
  def sourceFreshness(df: DataFrame, timestampCol: String, source: String,
      warnAfterHours: Double = 24.0, errorAfterHours: Double = 48.0,
      asOf: org.apache.spark.sql.Column = current_timestamp()): DataFrame =
    df.agg(max(col(timestampCol)).as("max_loaded_at"))
      // whole-second difference divided once: exact integers in, one IEEE
      // division out — engine-portable without rounding
      .select(lit(source).as("source"), col("max_loaded_at"),
        // casts tolerate TIMESTAMP_NTZ loaded-at columns (UTC session tz)
        ((unix_timestamp(asOf.cast("timestamp")) -
          unix_timestamp(col("max_loaded_at").cast("timestamp"))) / 3600.0)
          .as("age_hours"))
      .withColumn("freshness_status",
        when(col("max_loaded_at").isNull, "error")
          .when(col("age_hours") > errorAfterHours, "error")
          .when(col("age_hours") > warnAfterHours, "warn")
          .otherwise("pass"))

  /** All dim_companies checks as ONE one-row DataFrame (a single job:
    * one row-level aggregate + the duplicate-key sub-aggregate), instead
    * of dimChecks' six actions — and oracle-checkable. */
  def report(dim: DataFrame): DataFrame = {
    def cnt(cond: org.apache.spark.sql.Column) =
      sum(when(cond, 1L).otherwise(0L))
    val rowLevel = dim.agg(
      cnt(col("match_confidence_score").isNull ||
        col("match_confidence_score") < 0.0 ||
        col("match_confidence_score") > 1.0).as("invalid_confidence"),
      cnt(col("entity_status").isNotNull &&
        !col("entity_status").isInCollection(Seq("Active", "Cancelled")))
        .as("bad_status"),
      cnt(col("state").isNotNull &&
        !col("state").isInCollection(graft.functions.Text.ValidStates))
        .as("bad_state"),
      cnt(col("data_source").isNotNull && !col("data_source")
        .isInCollection(Seq("MATCHED", "ABR_ONLY", "MERGED", "WEB_ONLY")))
        .as("bad_source"))
    val dups = dim.groupBy("abn").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("duplicate_abns"))
    dups.crossJoin(rowLevel)
  }

  /** Run all dim_companies checks; returns (checkName → violationCount). */
  def dimChecks(dim: DataFrame): Map[String, Long] = Map(
    "no_duplicate_abns" -> duplicateAbns(dim).count(),
    "valid_confidence" -> invalidConfidence(dim).count(),
    "accepted_status" -> notAccepted(dim, "entity_status",
      Seq("Active", "Cancelled")).count(),
    "accepted_state" -> notAccepted(dim, "state",
      graft.functions.Text.ValidStates).count(),
    "accepted_source" -> notAccepted(dim, "data_source",
      Seq("MATCHED", "ABR_ONLY", "MERGED", "WEB_ONLY")).count(),
    "confidence_range" -> outOfRange(dim, "match_confidence_score", 0, 1).count())
}
