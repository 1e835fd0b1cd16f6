package graft.etl

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Golden-record unification — the dbt intermediate + dim_companies layer
 * (reference: dbt/models/intermediate/int_matched_companies.sql,
 * dbt/models/marts/dim_companies.sql, and the driver-side merge at
 * src/load/upsert_logic.py:111-236) as one declarative job.
 */
object Golden {

  /**
   * Enrich accepted matches with both source sides
   * (int_matched_companies.sql:63-67): matches ⟕ web ON crawl_url,
   * ⟕ abr ON abn. Adds match_confidence bucket and completeness score.
   * `minScore` mirrors the dbt var `match_score_threshold` (0.75).
   */
  def matchedCompanies(matches: DataFrame, web: DataFrame, abr: DataFrame,
      minScore: Double = 0.75): DataFrame = {
    val m = matches.filter(col("final_score") >= minScore)
    val w = web.select(col("crawl_url"), col("industry_std"),
      col("domain"), col("is_au_domain"))
    val a = abr.select(col("abn_clean").as("abn"), col("entity_type_desc"),
      col("status_std"), col("state_std"), col("postcode_std"),
      col("start_date_parsed"))
    m.join(w, Seq("crawl_url"), "left")
      .join(a, Seq("abn"), "left")
      .withColumn("match_confidence", Text.confidenceBucket(col("final_score")))
      .withColumn("completeness_score", Text.completenessScore(Seq(
        col("crawl_name"), col("abr_name"), col("state_std"),
        col("postcode_std"), col("industry_std"))))
  }

  /**
   * dim_companies (dim_companies.sql:15-110): best match per ABN
   * (DISTINCT ON equivalent, deterministic tie-break) unioned with active
   * ABR-only entities (anti join), with per-field precedence merge:
   * ABR official name canonical, web name as trading name, confidence 1.0
   * for ABR-only rows.
   */
  def dimCompanies(matched: DataFrame, abr: DataFrame): DataFrame = {
    // Best match per ABN: argmax on final_score, tie-break smallest
    // crawl_url — single hash aggregation (min_by over (-score, url)),
    // no window sort.
    val others = matched.columns.filterNot(_ == "abn")
    val bestPerAbn = matched.groupBy("abn")
      .agg(min_by(struct(others.map(col): _*),
        struct(-col("final_score"), col("crawl_url"))).as("_r"))
      .select(col("abn") +: others.map(c => col(s"_r.$c").as(c)): _*)

    val matchedGolden = bestPerAbn.select(
      col("abn"),
      coalesce(col("abr_name"), col("crawl_name")).as("company_name"),
      when(col("crawl_name") =!= col("abr_name"), col("crawl_name"))
        .as("trading_name"),
      col("entity_type_desc"), col("status_std").as("entity_status"),
      col("state_std").as("state"), col("postcode_std").as("postcode"),
      col("industry_std").as("industry"), col("domain"),
      col("crawl_url").as("website_url"),
      col("final_score").cast("double").as("match_confidence_score"),
      lit("MATCHED").as("data_source"))

    // Active ABR entities with no match (dim_companies.sql:37-61) — the
    // NOT IN becomes a left_anti join (null-safe, scales as a shuffle
    // join; broadcastable when the match set is small).
    val matchedAbns = bestPerAbn.select(col("abn").as("matched_abn"))
    val abrOnly = abr
      .filter(col("status_std") === "Active")
      .join(matchedAbns, col("abn_clean") === col("matched_abn"), "left_anti")
      .select(
        col("abn_clean").as("abn"),
        col("clean_name").as("company_name"),
        lit(null).cast("string").as("trading_name"),
        col("entity_type_desc"), col("status_std").as("entity_status"),
        col("state_std").as("state"), col("postcode_std").as("postcode"),
        lit(null).cast("string").as("industry"),
        lit(null).cast("string").as("domain"),
        lit(null).cast("string").as("website_url"),
        lit(1.0).as("match_confidence_score"),
        lit("ABR_ONLY").as("data_source"))

    matchedGolden.unionByName(abrOnly)
  }
}
