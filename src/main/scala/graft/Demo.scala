package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic demo frames binding the generic ETL operators to the test
 * tables: a synthetic web-crawl side and ABR side are derived from `part`
 * (64 distinct two-word names repeated across partkeys — a natural
 * entity-resolution workload). The derivation is mirrored 1:1 by the
 * DuckDB WITH-prelude in [[OracleSql]] so every downstream operator is
 * oracle-checkable.
 */
object Demo {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Nanosecond parquet timestamps are read as long (see GraftSession's
    // nanosAsLong); convert to micros-precision timestamps.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Synthetic raw web-company records from even partkeys
    * (shape: Schemas.webCompaniesRaw). */
  def ccRaw(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .filter(col("p_partkey") % 2 === 0)
      .select(
        concat(lit("https://www."),
          regexp_replace(col("p_name"), " ", ""),
          col("p_partkey").cast("string"), lit(".com.au")).as("crawl_url"),
        concat(lit("Welcome to "), col("p_name"), lit(" Pty Ltd"))
          .as("company_name"),
        when(col("p_type") === "ECONOMY", "finance")
          .when(col("p_type") === "PROMO", "tech")
          .when(col("p_type") === "STANDARD", "retail shop")
          .when(col("p_type") === "LARGE", "mining")
          .when(col("p_type") === "MEDIUM", "transport")
          .otherwise("farm").as("industry"),
        lit(null).cast("string").as("raw_text"))

  /** Synthetic raw ABR records from odd partkeys
    * (shape: Schemas.abrEntitiesRaw). Every 7th row gets a "trading"
    * name variant so similarity scores spread below 1.0. */
  def abrRaw(spark: SparkSession, dir: String): DataFrame = {
    val d = date_add(to_date(lit("1990-01-01")),
      (col("p_partkey") % 9000).cast("int"))
    table(spark, dir, "part")
      .filter(col("p_partkey") % 2 === 1)
      .select(
        (lit(10000000000L) + col("p_partkey") * 97).cast("string").as("abn"),
        concat(col("p_name"),
          when(col("p_partkey") % 7 === 0, " trading pty ltd")
            .otherwise(" pty ltd")).as("entity_name"),
        element_at(typedlit(Seq("PRV", "PUB", "TRT", "PNR")),
          (col("p_partkey") % 4).cast("int") + 1).as("entity_type"),
        when(col("p_partkey") % 3 === 0, "active")
          .when(col("p_partkey") % 3 === 1, "Registered")
          .otherwise("CANCELLED").as("entity_status"),
        element_at(typedlit(graft.functions.Text.ValidStates),
          (col("p_size") % 8).cast("int") + 1).as("state"),
        (col("p_size") + 2000).cast("string").as("postcode"),
        when(col("p_partkey") % 3 === 0, date_format(d, "yyyyMMdd"))
          .when(col("p_partkey") % 3 === 1, date_format(d, "yyyy-MM-dd"))
          .otherwise(date_format(d, "dd/MM/yyyy")).as("start_date"))
  }
}
