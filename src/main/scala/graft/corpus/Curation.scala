package graft.corpus

import graft.functions.Text
import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * URL/domain-level corpus curation — the web-pipeline moves between raw
 * crawl and text filtering: C4 drops documents from blocklisted
 * domains, RefinedWeb caps how many documents any single domain may
 * contribute, and the reference gates its crawl to `.au` hosts
 * (`src/ingest/parse_commoncrawl.py:79-122` generalized to corpus
 * scale). All three compose [[graft.functions.Text.extractDomain]] —
 * the same byte-exact host extraction the ETL cleaning path uses — so
 * a DuckDB oracle replays every decision.
 *
 * Scale shape: domain extraction is a map-side regex; the blocklist
 * ships with the plan (broadcast semantics); the per-domain cap is one
 * ranking window per domain over the md5-rank total order
 * ([[Sampling.balanced]]'s machinery) — no global sort, no driver
 * state.
 */
object Curation {

  /** `df` plus the extracted domain (host, `www.` stripped, lowered;
    * "" when `urlCol` is not URL-shaped). */
  def withDomain(df: DataFrame, urlCol: String,
      out: String = "domain"): DataFrame =
    df.withColumn(out, Text.extractDomain(col(urlCol)))

  /**
   * Domain gating (the C4 blocklist move + the reference's suffix
   * gate): keep documents whose extracted domain is NOT in `blocked`
   * and (when `keepSuffix` is set) ends with the suffix. The blocklist
   * rides the plan as a literal set — real blocklists are thousands of
   * entries, comfortably plan-shippable; for multi-million-entry lists
   * use a broadcast-DataFrame `left_anti` join on the domain instead
   * (same output, index-sized build side).
   */
  def domainFilter(df: DataFrame, urlCol: String, blocked: Seq[String],
      keepSuffix: Option[String] = None): DataFrame = {
    val d = Text.extractDomain(col(urlCol))
    val notBlocked =
      if (blocked.isEmpty) lit(true) else !d.isin(blocked: _*)
    val suffixOk = keepSuffix.map(s => d.endsWith(s)).getOrElse(lit(true))
    df.filter(notBlocked && suffixOk)
  }

  /**
   * Per-domain frequency cap (RefinedWeb §3.1's "limit documents per
   * domain"): keep at most `cap` documents per extracted domain,
   * selected by the portable md5-bucket rank with key ties — a total
   * order, so the surviving set is a pure function of the keys (stable
   * across runs, engines and partitionings, and DuckDB-replayable),
   * unlike `limit()`-per-group which is partition-order-dependent.
   * Output carries the `domain` column.
   */
  def capPerDomain(df: DataFrame, urlCol: String, keyCol: String,
      cap: Long): DataFrame = {
    require(cap > 0, "per-domain cap must be positive")
    Sampling.balanced(withDomain(df, urlCol), keyCol, "domain", Some(cap))
  }
}
