package graft.etl

import org.apache.spark.sql.types._

/**
 * Table schemas and record types of the engine's four logical tables
 * (reference: src/load/create_tables.sql:12-101 and the dataclasses at
 * src/ingest/parse_commoncrawl.py:28-38, src/ingest/parse_abr.py:16-28,
 * src/transform/entity_match.py:26-42).
 */
object Schemas {

  /** Raw web-crawl company record (parse_commoncrawl.py:28-38). */
  val webCompaniesRaw: StructType = StructType(Seq(
    StructField("crawl_url", StringType, nullable = false),
    StructField("company_name", StringType, nullable = true),
    StructField("industry", StringType, nullable = true),
    StructField("raw_text", StringType, nullable = true)))

  /** Raw ABR entity record (parse_abr.py:16-28). */
  val abrEntitiesRaw: StructType = StructType(Seq(
    StructField("abn", StringType, nullable = true),
    StructField("entity_name", StringType, nullable = true),
    StructField("entity_type", StringType, nullable = true),
    StructField("entity_status", StringType, nullable = true),
    StructField("state", StringType, nullable = true),
    StructField("postcode", StringType, nullable = true),
    StructField("start_date", StringType, nullable = true)))

  /** Match result row (entity_match.py:26-42; create_tables.sql:55-79). */
  val matchResults: StructType = StructType(Seq(
    StructField("crawl_url", StringType, nullable = false),
    StructField("crawl_name", StringType, nullable = true),
    StructField("abn", StringType, nullable = true),
    StructField("abr_name", StringType, nullable = true),
    StructField("fuzzy_score", DoubleType, nullable = true),
    StructField("llm_score", DoubleType, nullable = true),
    StructField("final_score", DoubleType, nullable = true),
    StructField("match_method", StringType, nullable = true)))

  case class WebCompany(
      crawl_url: String, company_name: Option[String],
      industry: Option[String], raw_text: Option[String])

  case class AbrEntity(
      abn: Option[String], entity_name: Option[String],
      entity_type: Option[String], entity_status: Option[String],
      state: Option[String], postcode: Option[String],
      start_date: Option[String])

  case class MatchResult(
      crawl_url: String, crawl_name: Option[String],
      abn: Option[String], abr_name: Option[String],
      fuzzy_score: Option[Double], llm_score: Option[Double],
      final_score: Option[Double], match_method: Option[String])
}
