package graft.etl

import graft.functions.{GraftFunctions, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cleaning/normalization stage — the reference's
 * clean_commoncrawl_spark (src/transform/clean_commoncrawl.py:165-205) and
 * clean_abr_spark (src/transform/clean_abr.py:228-282) re-expressed as a
 * single declarative projection + filter per side.
 *
 * Every former Python UDF is a native Column expression (graft.functions),
 * so the whole stage stays inside whole-stage codegen and Catalyst can push
 * the null/length filters into the scan.
 */
object Clean {

  /** Clean the web-crawl side. Input columns: crawl_url, company_name,
    * industry, raw_text. Adds clean_name/normalized_name/domain/
    * is_au_domain/block_key, standardizes industry, drops rows without a
    * usable name, dedups by normalized_name (deterministic keep:
    * lowest crawl_url, unlike the reference's arbitrary dropDuplicates —
    * clean_commoncrawl.py:203). */
  def web(df: DataFrame, blockKeyLen: Int = 4): DataFrame = {
    val projected = df
      .withColumn("clean_name", Text.cleanCompanyName(col("company_name")))
      .withColumn("normalized_name", Text.normalizeName(col("clean_name")))
      .withColumn("industry_std", Text.cleanIndustry(col("industry")))
      .withColumn("domain", Text.extractDomain(col("crawl_url")))
      .withColumn("is_au_domain", Text.isAustralianDomain(col("crawl_url")))
      .withColumn("block_key", Text.blockKey(col("normalized_name"), blockKeyLen))
      .filter(col("clean_name").isNotNull && col("normalized_name") =!= "")
    dedupKeepFirst(projected, Seq("normalized_name"), Seq("crawl_url"))
  }

  /** Clean the ABR side. Input columns: abn, entity_name, entity_type,
    * entity_status, state, postcode, start_date. The reference filters out
    * checksum-invalid ABNs (clean_abr.py:267); we keep the flag as a column
    * so callers choose (`.filter(col("is_valid_abn"))` reproduces the
    * reference exactly). */
  def abr(df: DataFrame, blockKeyLen: Int = 4): DataFrame = {
    val projected = df
      .withColumn("abn_clean", Text.cleanAbn(col("abn")))
      .withColumn("is_valid_abn", GraftFunctions.abn_valid(col("abn_clean")))
      .withColumn("clean_name", Text.cleanEntityName(col("entity_name")))
      .withColumn("normalized_name", Text.normalizeName(col("clean_name")))
      .withColumn("entity_type_desc", Text.cleanEntityType(col("entity_type")))
      .withColumn("status_std", Text.cleanStatus(col("entity_status")))
      .withColumn("state_std", Text.cleanState(col("state")))
      .withColumn("postcode_std", Text.cleanPostcode(col("postcode")))
      .withColumn("start_date_parsed", Text.parseDateMulti(col("start_date")))
      .withColumn("block_key", Text.blockKey(col("normalized_name"), blockKeyLen))
      .filter(col("abn_clean").isNotNull &&
        col("clean_name").isNotNull && col("normalized_name") =!= "")
    dedupKeepFirst(projected, Seq("abn_clean"), Seq("entity_name"))
  }

  /**
   * Deterministic dropDuplicates: keep the row with the smallest
   * `orderCols` per `keyCols` group. The reference's dropDuplicates keeps
   * an arbitrary row (clean_commoncrawl.py:203, clean_abr.py:280); a
   * deterministic keep is required for oracle comparison and is what you
   * want in production anyway.
   *
   * Scale note: implemented as a single hash-aggregation
   * (`max_by`/`min_by` struct) rather than a window, so it needs one
   * shuffle and no sort. At 100 TB a window over partitionBy(key) would
   * sort each partition; min_by aggregates map-side first.
   */
  def dedupKeepFirst(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keyCols.contains)
    val packed = struct((orderCols ++ others.filterNot(orderCols.contains))
      .map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(packed, struct(orderCols.map(col): _*)).as("_row"))
      .select(keyCols.map(col) ++ others.map(c => col(s"_row.$c").as(c)): _*)
      // restore original column order
      .select(df.columns.map(col): _*)
  }
}
