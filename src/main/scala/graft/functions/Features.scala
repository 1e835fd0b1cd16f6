package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Pair-matching feature vector + weighted match probability
 * (reference: src/transform/feature_engineering.py:33-289, F26 in
 * SURVEY.md §2.7).
 *
 * All features are Column expressions over a candidate-pair DataFrame, so
 * feature generation is one codegen'd projection — the reference computes
 * these row-at-a-time in Python over pandas batches. The four RapidFuzz
 * kernels are codegen'd StaticInvoke expressions (GraftFunctions); the
 * rest are pure built-ins.
 */
object Features {

  /** Name-similarity block (feature_engineering.py:75-117). Null/empty
    * names zero the whole block, as in the reference.
    *
    * `ratios` may be a PRE-PROJECTED `name_ratios(name1, name2)` column
    * (see [[withNameRatios]]): the four ratio features then read array
    * slots of one kernel evaluation. Passing the raw expression instead
    * would re-run the kernel per feature — each guard is a `when()`
    * branch, and codegen's subexpression elimination does not extract
    * subtrees that are only conditionally evaluated. */
  def nameFeatures(name1: Column, name2: Column,
      ratios: Option[Column] = None): Seq[(String, Column)] = {
    val bothPresent = name1.isNotNull && name2.isNotNull &&
      name1 =!= "" && name2 =!= ""
    def guarded(c: Column): Column =
      when(bothPresent, c).otherwise(lit(0.0))
    val exact = guarded(
      when(Text.normalizeName(name1) === Text.normalizeName(name2), 1.0)
        .otherwise(0.0))
    val r = ratios.getOrElse(GraftFunctions.name_ratios(name1, name2))
    Seq(
      "name_exact_match" -> exact,
      "normalized_exact" -> exact,
      "name_fuzzy_ratio" -> guarded(r.getItem(0)),
      "name_token_sort" -> guarded(r.getItem(1)),
      "name_token_set" -> guarded(r.getItem(2)),
      "name_partial_ratio" -> guarded(r.getItem(3)))
  }

  /** Domain block (feature_engineering.py:119-155): does the URL's domain
    * contain a (≥4-char) token of the normalized entity name; fuzzy ratio
    * of squashed domain vs squashed name. */
  def domainFeatures(url: Column, entityName: Column): Seq[(String, Column)] = {
    val bothPresent = url.isNotNull && entityName.isNotNull &&
      url =!= "" && entityName =!= ""
    val domain = lower(Text.extractDomain(url))
    val parts = split(lower(Text.normalizeName(entityName)), "\\s+")
    val containsPart = exists(parts,
      p => length(p) >= 4 && domain.contains(p))
    val domainClean = regexp_replace(
      regexp_replace(domain, "\\.com\\.au$|\\.au$", ""), "[^a-z0-9]", "")
    val nameClean = regexp_replace(array_join(parts, ""), "[^a-z0-9]", "")
    Seq(
      "domain_name_match" -> when(bothPresent &&
          domainClean =!= "" && nameClean =!= "",
        GraftFunctions.indel_ratio(domainClean, nameClean)).otherwise(lit(0.0)),
      "domain_contains_name" -> when(bothPresent && containsPart, 1.0)
        .otherwise(lit(0.0)))
  }

  /** State-name/city variants per state code
    * (feature_engineering.py:170-182). */
  val StateVariants: Map[String, Seq[String]] = Map(
    "NSW" -> Seq("nsw", "new south wales", "sydney"),
    "VIC" -> Seq("vic", "victoria", "melbourne"),
    "QLD" -> Seq("qld", "queensland", "brisbane"),
    "SA" -> Seq("south australia", "adelaide"),
    "WA" -> Seq("western australia", "perth"),
    "TAS" -> Seq("tasmania", "hobart"),
    "NT" -> Seq("northern territory", "darwin"),
    "ACT" -> Seq("act", "canberra", "australian capital"))

  /** Location block (feature_engineering.py:157-199): is the ABR state
    * (any variant) or exact postcode mentioned in the page text. */
  def locationFeatures(rawText: Column, state: Column,
      postcode: Column): Seq[(String, Column)] = {
    val textPresent = rawText.isNotNull && rawText =!= ""
    val textLower = lower(rawText)
    val stateHit = StateVariants.foldLeft(
      textLower.contains(lower(state))) { case (acc, (code, variants)) =>
      when(upper(state) === code,
        variants.map(v => textLower.contains(v)).reduce(_ || _)).otherwise(acc)
    }
    Seq(
      "state_mentioned" -> when(textPresent && state.isNotNull && state =!= ""
        && stateHit, 1.0).otherwise(lit(0.0)),
      "postcode_mentioned" -> when(textPresent && postcode.isNotNull &&
        postcode =!= "" && rawText.contains(postcode), 1.0).otherwise(lit(0.0)))
  }

  /** Industry block (feature_engineering.py:201-219). */
  def industryFeatures(industry: Column, entityType: Column): Seq[(String, Column)] = Seq(
    "industry_present" -> when(industry.isNotNull && industry =!= "", 1.0)
      .otherwise(lit(0.0)),
    "is_company" -> when(entityType.isin(
      "PRV", "PUB", "Private Company", "Public Company"), 1.0)
      .otherwise(lit(0.0)))

  /** Column name used by [[withNameRatios]] for the fused ratio array. */
  val RatiosCol = "_name_ratios"

  /** Pre-project the fused four-ratio kernel column so the feature
    * projection evaluates it once per row. */
  def withNameRatios(df: org.apache.spark.sql.DataFrame,
      name1: Column, name2: Column): org.apache.spark.sql.DataFrame =
    df.withColumn(RatiosCol, GraftFunctions.name_ratios(name1, name2))

  /** The full 12-feature vector as named columns. */
  def all(companyName: Column, entityName: Column, url: Column,
      rawText: Column, state: Column, postcode: Column,
      industry: Column, entityType: Column,
      ratios: Option[Column] = None): Seq[(String, Column)] =
    nameFeatures(companyName, entityName, ratios) ++
      domainFeatures(url, entityName) ++
      locationFeatures(rawText, state, postcode) ++
      industryFeatures(industry, entityType)

  /** Weighted-sum match probability (compute_match_probability,
    * feature_engineering.py:256-289). Weights sum to 1.0 when all listed
    * features are present, so no renormalization is needed here. */
  val ProbabilityWeights: Seq[(String, Double)] = Seq(
    "name_exact_match" -> 0.30,
    "name_token_sort" -> 0.20,
    "name_token_set" -> 0.15,
    "domain_name_match" -> 0.15,
    "domain_contains_name" -> 0.10,
    "state_mentioned" -> 0.05,
    "postcode_mentioned" -> 0.05)

  /** Probability from feature columns already on the frame. */
  def matchProbability(colFor: String => Column): Column = {
    val total = ProbabilityWeights.map(_._2).sum
    ProbabilityWeights.map { case (f, w) => colFor(f) * lit(w) }
      .reduce(_ + _) / lit(total)
  }
}
