package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Match-statistics mart — fct_match_statistics
 * (reference: dbt/models/marts/fct_match_statistics.sql) plus the loader's
 * get_match_statistics queries (src/load/upsert_logic.py:291-329).
 *
 * Three singleton aggregates cross-joined 1×1×1, exactly the dbt shape;
 * each is a single HashAggregate with map-side partials.
 */
object Stats {

  /** One-row summary: counts, conditional counts, distinct domains,
    * score min/avg/max, match-rate percentages
    * (fct_match_statistics.sql:13-95). All ratios rounded to 4 places so
    * results are engine-portable. */
  def matchStatistics(web: DataFrame, abr: DataFrame,
      matches: DataFrame, highConf: Double = 0.90): DataFrame = {
    val webStats = web.agg(
      count(lit(1)).as("total_web_companies"),
      countDistinct(col("domain")).as("distinct_domains"),
      sum(when(col("is_au_domain"), 1).otherwise(0)).as("au_domain_count"))
    val abrStats = abr.agg(
      count(lit(1)).as("total_abr_entities"),
      sum(when(col("status_std") === "Active", 1).otherwise(0))
        .as("active_entities"),
      countDistinct(col("state_std")).as("states_covered"))
    val matchStats = matches.agg(
      count(lit(1)).as("total_matches"),
      sum(when(col("final_score") >= highConf, 1).otherwise(0))
        .as("high_confidence_matches"),
      round(avg(col("final_score")), 4).as("avg_match_score"),
      round(min(col("final_score")), 4).as("min_match_score"),
      round(max(col("final_score")), 4).as("max_match_score"))
    webStats.crossJoin(abrStats).crossJoin(matchStats)
      .withColumn("match_rate_pct",
        when(col("total_web_companies") === 0, lit(null))
          .otherwise(round(col("total_matches") * lit(100.0) /
            col("total_web_companies"), 4)))
      .withColumn("high_conf_rate_pct",
        when(col("total_matches") === 0, lit(null))
          .otherwise(round(col("high_confidence_matches") * lit(100.0) /
            col("total_matches"), 4)))
  }

  /** Per-state match counts, descending (fct_match_statistics.sql:43-50;
    * upsert_logic.py:317-328). */
  def matchesByState(matched: DataFrame): DataFrame =
    matched.groupBy(col("state_std").as("state"))
      .agg(count(lit(1)).as("match_count"))
      .orderBy(desc("match_count"), asc_nulls_first("state"))

  /** Per-method stats (upsert_logic.py:304-314). */
  def matchesByMethod(matches: DataFrame): DataFrame =
    matches.groupBy("match_method")
      .agg(count(lit(1)).as("n"),
        round(avg(col("final_score")), 4).as("avg_score"))
      .orderBy("match_method")

  /** Per-column dataset profile in ONE aggregation pass: row count,
    * non-null count, approximate distinct (HLL++, rsd 5%), min/max as
    * strings, mean for numeric columns. The profiling sweep a
    * training-data pipeline runs before using a new source — one job
    * regardless of column count (each metric is a map-side partial
    * aggregate; no per-column scans). Approximate distinct is the scale
    * choice: exact countDistinct per column would add one shuffle each. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        f.name
    }.toSet
    val aggs = targets.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        approx_count_distinct(col(c), 0.05).as(s"_dst_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"),
        (if (numeric(c)) round(avg(col(c)), 4) else lit(null).cast("double"))
          .as(s"_avg_$c"))
    }
    val one = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    val entries = array(targets.map(c => struct(
      lit(c).as("column"),
      col("_rows").as("n_rows"),
      col(s"_cnt_$c").as("n_non_null"),
      col(s"_dst_$c").as("approx_distinct"),
      col(s"_min_$c").as("min_value"),
      col(s"_max_$c").as("max_value"),
      col(s"_avg_$c").as("mean"))): _*)
    one.select(explode(entries).as("p")).select("p.*")
  }

  /** State→count as a single JSON object column — the
    * jsonb_object_agg shape (fct_match_statistics.sql:85-89). Sorted map
    * entries so the JSON string is deterministic. */
  def stateBreakdownJson(matched: DataFrame): DataFrame =
    matched.filter(col("state_std").isNotNull)
      .groupBy(col("state_std").as("state"))
      .agg(count(lit(1)).as("cnt"))
      .agg(to_json(map_from_entries(array_sort(
        collect_list(struct(col("state"), col("cnt"))))))
        .as("state_breakdown"))
}
