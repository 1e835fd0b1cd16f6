package graft

import graft.functions.Features
import org.apache.spark.sql.functions._

/** F26 feature engineering (reference: src/transform/feature_engineering.py,
  * tests/test_matching.py:115-182). */
class FeaturesSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val cols = Seq("company_name", "entity_name", "url", "raw_text",
    "state", "postcode", "industry", "entity_type")
  private def features(company: String, entity: String, url: String = null,
      rawText: String = null, state: String = null, postcode: String = null,
      industry: String = null, entityType: String = null): Map[String, Double] = {
    val schema = StructType(cols.map(StructField(_, StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        company, entity, url, rawText, state, postcode, industry, entityType))),
      schema)
    val feats = Features.all(col("company_name"), col("entity_name"),
      col("url"), col("raw_text"), col("state"), col("postcode"),
      col("industry"), col("entity_type"))
    val out = df.select(feats.map { case (n, c) => c.as(n) }: _*)
      .withColumn("match_probability", Features.matchProbability(col))
    out.collect().head.getValuesMap[Double](out.columns).toMap
  }

  test("exact-match pair: all name features 1.0 (test_matching.py:115-127)") {
    val f = features("ACME CORPORATION PTY LTD", "ACME CORPORATION PTY LTD",
      url = "https://www.acme.com.au/", state = "NSW",
      rawText = "ACME has offices in Sydney", entityType = "PRV")
    assert(f("name_exact_match") === 1.0)
    assert(f("normalized_exact") === 1.0)
    assert(f("name_token_sort") === 1.0)
    assert(f("name_token_set") === 1.0)
    // normalization makes exact-match case/stopword-insensitive even when
    // the RapidFuzz kernels (faithfully case-sensitive) score < 1
    val mixed = features("ACME Corporation Pty Ltd", "ACME CORPORATION PTY LTD")
    assert(mixed("name_exact_match") === 1.0)
    assert(mixed("name_token_sort") < 1.0)
    assert(f("domain_contains_name") === 1.0) // "acme" in acme.com.au
    assert(f("domain_name_match") === 1.0) // acme == acme squashed
    assert(f("state_mentioned") === 1.0) // "sydney" variant
    assert(f("is_company") === 1.0)
    assert(f("match_probability") > 0.9)
  }

  test("different companies: low features (test_matching.py:129-136)") {
    val f = features("Completely Different Name", "ACME CORPORATION",
      url = "https://www.different.com.au/")
    assert(f("name_exact_match") === 0.0)
    assert(f("name_token_sort") < 0.5)
    assert(f("domain_contains_name") === 0.0)
    assert(f("match_probability") < 0.3)
  }

  test("null/empty names zero the name block (feature_engineering.py:84-92)") {
    val f = features(null, "ACME")
    assert(f("name_exact_match") === 0.0 && f("name_fuzzy_ratio") === 0.0 &&
      f("name_partial_ratio") === 0.0)
  }

  test("location features: variants and postcode (feature_engineering.py:157-199)") {
    val f = features("A", "A", rawText = "Visit us in New South Wales at 2041",
      state = "NSW", postcode = "2041")
    assert(f("state_mentioned") === 1.0 && f("postcode_mentioned") === 1.0)
    // SA's variants exclude the bare code, so plain "sa" must not hit
    val g = features("A", "A", rawText = "sa is mentioned", state = "SA")
    assert(g("state_mentioned") === 0.0)
    val h = features("A", "A", rawText = "our adelaide branch", state = "SA")
    assert(h("state_mentioned") === 1.0)
  }

  test("probability weights renormalize to [0,1] (feature_engineering.py:256-289)") {
    val empty = features(null, null)
    assert(empty("match_probability") === 0.0)
  }
}
