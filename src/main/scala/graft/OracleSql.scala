package graft

/**
 * DuckDB-dialect oracle SQL for SparkEntry.queries. The WITH-prelude
 * mirrors [[Demo]] and the graft.etl operators 1:1 (note: DuckDB
 * regexp_replace needs the 'g' flag to match Spark's replace-all default,
 * and single-quoted literals do not process backslashes).
 */
object OracleSql {

  private val stopRe =
    """\b(PTY|LTD|LIMITED|PROPRIETARY|AUSTRALIAN|AUSTRALIA|HOLDINGS|GROUP|SERVICES|CORPORATION|CORP|INC|CO|THE|AND|OF)\b"""

  /** normalize_company_name emulation over a SQL expression. */
  private def norm(e: String): String =
    raw"""trim(regexp_replace(regexp_replace(regexp_replace(upper(coalesce($e,'')),'[^\w\s]',' ','g'),'$stopRe',' ','g'),'\s+',' ','g'))"""

  /** ABN checksum (utils.py:270-300) as explicit arithmetic. */
  private def abnChecksum(e: String): String = {
    val weights = Seq(10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)
    val terms = weights.zipWithIndex.map { case (w, i) =>
      val d = s"CAST(substr($e,${i + 1},1) AS INT)"
      if (i == 0) s"($d - 1) * $w" else s"$d * $w"
    }.mkString(" + ")
    s"(len($e) = 11 AND ($terms) % 89 = 0)"
  }

  private def jaccardToks(e: String): String =
    s"list_distinct(list_filter(string_split(lower($e), ' '), x -> x <> ''))"

  /** Shared WITH-prelude: demo raw frames + cleaned sides + match + golden.
    * Table names (part, lineitem, ...) are registered by the driver over
    * the same parquet dir. */
  val prelude: String = raw"""WITH
cc_raw AS (
  SELECT 'https://www.' || replace(p_name, ' ', '') || CAST(p_partkey AS VARCHAR) || '.com.au' AS crawl_url,
         'Welcome to ' || p_name || ' Pty Ltd' AS company_name,
         CASE p_type WHEN 'ECONOMY' THEN 'finance' WHEN 'PROMO' THEN 'tech'
              WHEN 'STANDARD' THEN 'retail shop' WHEN 'LARGE' THEN 'mining'
              WHEN 'MEDIUM' THEN 'transport' ELSE 'farm' END AS industry
  FROM part WHERE p_partkey % 2 = 0),
cc_c1 AS (
  SELECT crawl_url, industry,
         trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           trim(regexp_replace(company_name, '\s+', ' ', 'g')),
           '(?i)^welcome to\s+', '', 'g'), '(?i)^about\s+', '', 'g'),
           '(?i)^home\s*[-–]\s*', '', 'g'), '(?i)\s*[-–]\s*home$$', '', 'g'),
           '(?i)\s*\|\s*official.*$$', '', 'g')) AS cn
  FROM cc_raw),
cc_c2 AS (
  SELECT crawl_url, industry,
         CASE WHEN len(cn) BETWEEN 2 AND 200 THEN cn END AS clean_name
  FROM cc_c1),
cc_c3 AS (
  SELECT crawl_url, industry, clean_name, ${norm("clean_name")} AS normalized_name,
         lower(regexp_replace(regexp_extract(crawl_url, '://([^/?#]+)', 1), '^www\.', '', 'g')) AS domain
  FROM cc_c2 WHERE clean_name IS NOT NULL),
cc_clean AS (
  SELECT crawl_url, clean_name, normalized_name,
         CASE industry WHEN 'finance' THEN 'Financial Services'
              WHEN 'tech' THEN 'Information Technology'
              WHEN 'retail shop' THEN 'Retail' WHEN 'mining' THEN 'Mining & Resources'
              WHEN 'transport' THEN 'Transport & Logistics' ELSE 'Agriculture' END AS industry_std,
         domain, ends_with(domain, '.au') AS is_au_domain,
         lower(substr(normalized_name, 1, 4)) AS block_key
  FROM cc_c3 WHERE normalized_name <> ''
  QUALIFY row_number() OVER (PARTITION BY normalized_name ORDER BY crawl_url) = 1),
abr_raw AS (
  SELECT CAST(10000000000 + p_partkey * 97 AS VARCHAR) AS abn,
         p_name || CASE WHEN p_partkey % 7 = 0 THEN ' trading pty ltd' ELSE ' pty ltd' END AS entity_name,
         ['PRV','PUB','TRT','PNR'][(p_partkey % 4) + 1] AS entity_type,
         CASE p_partkey % 3 WHEN 0 THEN 'active' WHEN 1 THEN 'Registered' ELSE 'CANCELLED' END AS entity_status,
         ['NSW','VIC','QLD','SA','WA','TAS','NT','ACT'][(p_size % 8) + 1] AS state,
         CAST(2000 + p_size AS VARCHAR) AS postcode,
         CASE p_partkey % 3
           WHEN 0 THEN strftime(DATE '1990-01-01' + CAST(p_partkey % 9000 AS INT), '%Y%m%d')
           WHEN 1 THEN strftime(DATE '1990-01-01' + CAST(p_partkey % 9000 AS INT), '%Y-%m-%d')
           ELSE strftime(DATE '1990-01-01' + CAST(p_partkey % 9000 AS INT), '%d/%m/%Y') END AS start_date
  FROM part WHERE p_partkey % 2 = 1),
abr_c1 AS (
  SELECT *,
         CASE WHEN len(regexp_replace(abn, '\D', '', 'g')) = 11
              THEN regexp_replace(abn, '\D', '', 'g') END AS abn_clean,
         substr(trim(regexp_replace(trim(regexp_replace(entity_name, '\s+', ' ', 'g')),
           '(?i)\s+AS\s+TRUSTEE.*$$', '', 'g')), 1, 200) AS en
  FROM abr_raw),
abr_c2 AS (
  SELECT *, CASE WHEN en <> '' THEN en END AS clean_name,
         ${norm("en")} AS normalized_name
  FROM abr_c1),
abr_clean AS (
  SELECT abn_clean, ${abnChecksum("abn_clean")} AS is_valid_abn,
         clean_name, normalized_name,
         CASE entity_type WHEN 'PRV' THEN 'Private Company' WHEN 'PUB' THEN 'Public Company'
              WHEN 'TRT' THEN 'Trust' ELSE 'Partnership' END AS entity_type_desc,
         CASE WHEN lower(trim(entity_status)) LIKE '%active%'
                OR lower(trim(entity_status)) LIKE '%registered%' THEN 'Active'
              WHEN lower(trim(entity_status)) LIKE '%cancel%'
                OR lower(trim(entity_status)) LIKE '%deregistered%' THEN 'Cancelled'
              END AS status_std,
         state AS state_std,
         regexp_extract(postcode, '\b(\d{4})\b', 1) AS postcode_std,
         CAST(coalesce(try_strptime(start_date, '%Y%m%d'),
                       try_strptime(start_date, '%Y-%m-%d'),
                       try_strptime(start_date, '%d/%m/%Y')) AS DATE) AS start_date_parsed,
         lower(substr(normalized_name, 1, 4)) AS block_key
  FROM abr_c2
  WHERE abn_clean IS NOT NULL AND clean_name IS NOT NULL AND normalized_name <> ''
  QUALIFY row_number() OVER (PARTITION BY abn_clean ORDER BY entity_name) = 1),
cand AS (
  SELECT w.crawl_url, w.clean_name AS crawl_name, a.abn_clean AS abn,
         a.clean_name AS abr_name,
         CAST(len(list_intersect(w.tw, a.ta)) AS DOUBLE) /
           (len(w.tw) + len(a.ta) - len(list_intersect(w.tw, a.ta))) AS fuzzy_score
  FROM (SELECT *, ${jaccardToks("normalized_name")} AS tw FROM cc_clean) w
  JOIN (SELECT *, ${jaccardToks("normalized_name")} AS ta FROM abr_clean) a USING (block_key)),
match AS (
  SELECT crawl_url, crawl_name, abn, abr_name, fuzzy_score,
         CAST(NULL AS DOUBLE) AS llm_score, fuzzy_score AS final_score,
         'fuzzy' AS match_method
  FROM cand WHERE fuzzy_score >= 0.6
  QUALIFY row_number() OVER (PARTITION BY crawl_url ORDER BY fuzzy_score DESC, abn) = 1),
mjoin AS (
  SELECT m.*, w.industry_std, w.domain, w.is_au_domain,
         a.entity_type_desc, a.status_std, a.state_std, a.postcode_std, a.start_date_parsed
  FROM match m
  LEFT JOIN cc_clean w USING (crawl_url)
  LEFT JOIN abr_clean a ON m.abn = a.abn_clean
  WHERE m.final_score >= 0.6),
best AS (
  SELECT * FROM mjoin
  QUALIFY row_number() OVER (PARTITION BY abn ORDER BY final_score DESC, crawl_url) = 1),
dim AS (
  SELECT abn, coalesce(abr_name, crawl_name) AS company_name,
         CASE WHEN crawl_name <> abr_name THEN crawl_name END AS trading_name,
         entity_type_desc, status_std AS entity_status, state_std AS state,
         postcode_std AS postcode, industry_std AS industry, domain,
         crawl_url AS website_url, final_score AS match_confidence_score,
         'MATCHED' AS data_source
  FROM best
  UNION ALL
  SELECT abn_clean, clean_name, CAST(NULL AS VARCHAR), entity_type_desc,
         status_std, state_std, postcode_std, CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 1.0, 'ABR_ONLY'
  FROM abr_clean
  WHERE status_std = 'Active' AND abn_clean NOT IN (SELECT abn FROM best))
"""

  /** CTEs for the LLM-rescue demo (threshold 0.75, band [0.60,0.75),
    * deterministic stub scorer = 1.0 iff upper(abr) contains first 4 of
    * upper(crawl), weights 0.7/0.3 — SparkEntry.DemoLlm / llmCfg). */
  private val llmCtes: String = raw""",
high75 AS (
  SELECT crawl_url, crawl_name, abn, abr_name, fuzzy_score,
         CAST(NULL AS DOUBLE) AS llm_score, fuzzy_score AS final_score,
         'fuzzy' AS match_method
  FROM cand WHERE fuzzy_score >= 0.75
  QUALIFY row_number() OVER (PARTITION BY crawl_url ORDER BY fuzzy_score DESC, abn) = 1),
band AS (
  SELECT crawl_url, crawl_name, abn, abr_name, fuzzy_score
  FROM cand WHERE fuzzy_score >= 0.60 AND fuzzy_score < 0.75
  QUALIFY row_number() OVER (PARTITION BY crawl_url ORDER BY fuzzy_score DESC, abn) = 1),
rescued AS (
  SELECT crawl_url, crawl_name, abn, abr_name, fuzzy_score, llm_score,
         CAST(0.7 AS DOUBLE) * fuzzy_score + CAST(0.3 AS DOUBLE) * llm_score AS final_score,
         'fuzzy+llm' AS match_method
  FROM (SELECT *, CASE WHEN contains(upper(abr_name), substr(upper(crawl_name), 1, 4))
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS llm_score
        FROM band)
  WHERE CAST(0.7 AS DOUBLE) * fuzzy_score + CAST(0.3 AS DOUBLE) * llm_score >= 0.75),
match_llm AS (SELECT * FROM high75 UNION ALL SELECT * FROM rescued),
merge_ex AS (
  SELECT abn_clean, clean_name, status_std, state_std, postcode_std FROM abr_clean),
merge_inc AS (
  SELECT abn_clean, clean_name, 'Cancelled' AS status_std, state_std,
         CAST(NULL AS VARCHAR) AS postcode_std
  FROM merge_ex WHERE ends_with(abn_clean, '7'))
"""

  val entityMatchLlm: String = prelude + llmCtes +
    """SELECT * FROM match_llm ORDER BY crawl_url"""

  val matchesByMethod: String = prelude + llmCtes +
    """SELECT match_method, count(*) AS n, round(avg(final_score), 4) AS avg_score
FROM match_llm GROUP BY match_method ORDER BY match_method"""

  val mergeUpsert: String = prelude + llmCtes +
    """SELECT * FROM merge_inc
UNION ALL
SELECT * FROM merge_ex WHERE abn_clean NOT IN (SELECT abn_clean FROM merge_inc)
ORDER BY abn_clean"""

  val mergePatch: String = prelude + llmCtes +
    """SELECT abn_clean,
  coalesce(i.clean_name, e.clean_name) AS clean_name,
  coalesce(i.status_std, e.status_std) AS status_std,
  coalesce(i.state_std, e.state_std) AS state_std,
  coalesce(i.postcode_std, e.postcode_std) AS postcode_std
FROM merge_ex e FULL JOIN merge_inc i USING (abn_clean)
ORDER BY abn_clean"""

  val qualityReport: String = prelude + """SELECT
  (SELECT count(*) FROM (SELECT abn FROM dim GROUP BY abn HAVING count(*) > 1)) AS duplicate_abns,
  count(*) FILTER (WHERE match_confidence_score IS NULL
                     OR match_confidence_score < 0 OR match_confidence_score > 1) AS invalid_confidence,
  count(*) FILTER (WHERE entity_status IS NOT NULL
                     AND entity_status NOT IN ('Active','Cancelled')) AS bad_status,
  count(*) FILTER (WHERE state IS NOT NULL
                     AND state NOT IN ('NSW','VIC','QLD','SA','WA','TAS','NT','ACT')) AS bad_state,
  count(*) FILTER (WHERE data_source IS NOT NULL
                     AND data_source NOT IN ('MATCHED','ABR_ONLY','MERGED','WEB_ONLY')) AS bad_source,
  f.source, f.max_loaded_at, f.age_hours, f.freshness_status
FROM dim CROSS JOIN (
  SELECT 'events' AS source, max(ts) AS max_loaded_at,
         (floor(epoch(TIMESTAMP '2026-01-01 00:00:00')) - floor(epoch(max(ts)))) / 3600.0 AS age_hours,
         CASE WHEN max(ts) IS NULL THEN 'error'
              WHEN (floor(epoch(TIMESTAMP '2026-01-01 00:00:00')) - floor(epoch(max(ts)))) / 3600.0 > 48 THEN 'error'
              WHEN (floor(epoch(TIMESTAMP '2026-01-01 00:00:00')) - floor(epoch(max(ts)))) / 3600.0 > 24 THEN 'warn'
              ELSE 'pass' END AS freshness_status
  FROM events) f
GROUP BY f.source, f.max_loaded_at, f.age_hours, f.freshness_status"""

  /** ANSI-expressible subset of the F26 feature vector over the demo
    * candidate pairs (SparkEntry.featurePairs / Features.all). */
  val matchFeaturesAnsi: String = prelude + raw""",
fpairs AS (
  SELECT w.crawl_url, w.clean_name AS crawl_name, w.industry_std,
         w.normalized_name AS wnorm,
         a.abn_clean AS abn, a.clean_name AS abr_name, a.entity_type_desc,
         a.state_std, a.postcode_std, a.normalized_name AS anorm,
         CASE WHEN substr(a.abn_clean, 11, 1) = '3' THEN NULL
              ELSE 'Our head office is in ' || lower(a.state_std) ||
                   ' postcode ' || a.postcode_std END AS raw_text
  FROM cc_clean w JOIN abr_clean a USING (block_key))
SELECT crawl_url, abn,
  CAST(CASE WHEN crawl_name IS NOT NULL AND abr_name IS NOT NULL
             AND crawl_name <> '' AND abr_name <> ''
             AND wnorm = anorm THEN 1.0 ELSE 0.0 END AS DOUBLE) AS name_exact_match,
  CAST(CASE WHEN crawl_name IS NOT NULL AND abr_name IS NOT NULL
             AND crawl_name <> '' AND abr_name <> ''
             AND wnorm = anorm THEN 1.0 ELSE 0.0 END AS DOUBLE) AS normalized_exact,
  CAST(CASE WHEN crawl_url IS NOT NULL AND abr_name IS NOT NULL
             AND crawl_url <> '' AND abr_name <> ''
             AND len(list_filter(string_split_regex(lower(anorm), '\s+'),
                   p -> len(p) >= 4 AND contains(
                     lower(regexp_replace(regexp_extract(crawl_url, '://([^/?#]+)', 1), '^www\.', '', 'g')), p))) > 0
        THEN 1.0 ELSE 0.0 END AS DOUBLE) AS domain_contains_name,
  CAST(CASE WHEN raw_text IS NOT NULL AND raw_text <> ''
             AND state_std IS NOT NULL AND state_std <> ''
             AND (CASE upper(state_std)
                  WHEN 'NSW' THEN contains(lower(raw_text),'nsw') OR contains(lower(raw_text),'new south wales') OR contains(lower(raw_text),'sydney')
                  WHEN 'VIC' THEN contains(lower(raw_text),'vic') OR contains(lower(raw_text),'victoria') OR contains(lower(raw_text),'melbourne')
                  WHEN 'QLD' THEN contains(lower(raw_text),'qld') OR contains(lower(raw_text),'queensland') OR contains(lower(raw_text),'brisbane')
                  WHEN 'SA'  THEN contains(lower(raw_text),'south australia') OR contains(lower(raw_text),'adelaide')
                  WHEN 'WA'  THEN contains(lower(raw_text),'western australia') OR contains(lower(raw_text),'perth')
                  WHEN 'TAS' THEN contains(lower(raw_text),'tasmania') OR contains(lower(raw_text),'hobart')
                  WHEN 'NT'  THEN contains(lower(raw_text),'northern territory') OR contains(lower(raw_text),'darwin')
                  WHEN 'ACT' THEN contains(lower(raw_text),'act') OR contains(lower(raw_text),'canberra') OR contains(lower(raw_text),'australian capital')
                  ELSE contains(lower(raw_text), lower(state_std)) END)
        THEN 1.0 ELSE 0.0 END AS DOUBLE) AS state_mentioned,
  CAST(CASE WHEN raw_text IS NOT NULL AND raw_text <> ''
             AND postcode_std IS NOT NULL AND postcode_std <> ''
             AND contains(raw_text, postcode_std)
        THEN 1.0 ELSE 0.0 END AS DOUBLE) AS postcode_mentioned,
  CAST(CASE WHEN industry_std IS NOT NULL AND industry_std <> ''
        THEN 1.0 ELSE 0.0 END AS DOUBLE) AS industry_present,
  CAST(CASE WHEN entity_type_desc IN ('PRV','PUB','Private Company','Public Company')
        THEN 1.0 ELSE 0.0 END AS DOUBLE) AS is_company
FROM fpairs ORDER BY crawl_url, abn"""

  /**
   * Mirrors `match_features_ratios` — the RapidFuzz kernel columns
   * (fuzz.ratio / token_sort / token_set / partial_ratio), the squashed
   * domain ratio and the weighted probability, each LCS computed by ONE
   * shared anti-diagonal recursive-CTE DP over derived string pairs:
   * raw names ('fz'), token-sorted names ('ts'), the three token_set
   * constructions ('i1','i2','dd'), every partial_ratio window ('pw'),
   * squashed domain vs squashed name ('dm'). Float expressions follow
   * the kernels term-for-term (weights cast to DOUBLE — a bare 0.30
   * literal is DECIMAL in DuckDB and would not reproduce the engine's
   * IEEE product). Sampled to ~1% of pairs by md5(crawl_url||abn) so
   * the DP stays cheap at the verify SF.
   */
  val matchFeaturesRatios: String =
    prelude.replaceFirst("^WITH", "WITH RECURSIVE") + raw""",
fp0 AS (
  SELECT w.crawl_url, w.clean_name AS crawl_name, w.normalized_name AS wnorm,
         a.abn_clean AS abn, a.clean_name AS abr_name,
         a.normalized_name AS anorm, a.state_std, a.postcode_std,
         CASE WHEN substr(a.abn_clean, 11, 1) = '3' THEN NULL
              ELSE 'Our head office is in ' || lower(a.state_std) ||
                   ' postcode ' || a.postcode_std END AS raw_text
  FROM cc_clean w JOIN abr_clean a USING (block_key)
  WHERE CAST(CAST('0x' || substr(md5(w.crawl_url || a.abn_clean), 1, 15)
    AS BIGINT) % 10000 AS BIGINT) < 100),
fp AS (
  SELECT *,
    list_filter(string_split_regex(coalesce(crawl_name, ''), '\s+'),
      x -> x <> '') AS t1,
    list_filter(string_split_regex(coalesce(abr_name, ''), '\s+'),
      x -> x <> '') AS t2,
    lower(regexp_replace(regexp_extract(coalesce(crawl_url, ''),
      '://([^/?#]+)', 1), '^www\.', '', 'g')) AS dom
  FROM fp0),
fs AS (
  SELECT *,
    array_to_string(list_sort(t1), ' ') AS ts1,
    array_to_string(list_sort(t2), ' ') AS ts2,
    array_to_string(list_sort(list_distinct(list_intersect(t1, t2))), ' ') AS si,
    array_to_string(list_sort(list_filter(list_distinct(t1),
      x -> NOT list_contains(t2, x))), ' ') AS dd1,
    array_to_string(list_sort(list_filter(list_distinct(t2),
      x -> NOT list_contains(t1, x))), ' ') AS dd2,
    regexp_replace(regexp_replace(dom, '\.com\.au$$|\.au$$', ''),
      '[^a-z0-9]', '', 'g') AS domsq,
    regexp_replace(array_to_string(list_filter(
      string_split_regex(lower(coalesce(anorm, '')), '\s+'), x -> x <> ''),
      ''), '[^a-z0-9]', '', 'g') AS namesq
  FROM fp),
fsc AS (
  SELECT *,
    CASE WHEN dd1 = '' THEN si WHEN si = '' THEN dd1
         ELSE si || ' ' || dd1 END AS s1c,
    CASE WHEN dd2 = '' THEN si WHEN si = '' THEN dd2
         ELSE si || ' ' || dd2 END AS s2c,
    crawl_name IS NOT NULL AND abr_name IS NOT NULL
      AND crawl_name <> '' AND abr_name <> '' AS names_ok,
    crawl_url IS NOT NULL AND abr_name IS NOT NULL
      AND crawl_url <> '' AND abr_name <> '' AS dom_ok
  FROM fs),
tasks AS (
  SELECT crawl_url, abn, 'fz' AS kind, 0 AS widx,
         crawl_name AS a, abr_name AS b FROM fsc WHERE names_ok
  UNION ALL SELECT crawl_url, abn, 'ts', 0, ts1, ts2 FROM fsc
    WHERE names_ok AND ts1 <> '' AND ts2 <> ''
  UNION ALL SELECT crawl_url, abn, 'i1', 0, si, s1c FROM fsc
    WHERE names_ok AND len(t1) > 0 AND len(t2) > 0
  UNION ALL SELECT crawl_url, abn, 'i2', 0, si, s2c FROM fsc
    WHERE names_ok AND len(t1) > 0 AND len(t2) > 0
  UNION ALL SELECT crawl_url, abn, 'dd', 0, s1c, s2c FROM fsc
    WHERE names_ok AND len(t1) > 0 AND len(t2) > 0
  UNION ALL SELECT crawl_url, abn, 'dm', 0, domsq, namesq FROM fsc
    WHERE dom_ok AND domsq <> '' AND namesq <> ''
  -- partial_ratio windows: the shift range is derived PER ROW from the
  -- actual length difference (unnest over a scalar range list — the
  -- table-function range() only takes constants), so the oracle slides
  -- exactly the len(longer)-len(shorter)+1 offsets the engine's
  -- SimilarityKernel.partialRatio slides; a fixed range(0, 256) silently
  -- diverged for pairs with length difference > 255.
  UNION ALL SELECT crawl_url, abn, 'pw', CAST(w AS INT),
      CASE WHEN len(crawl_name) <= len(abr_name)
           THEN crawl_name ELSE abr_name END,
      substr(CASE WHEN len(crawl_name) <= len(abr_name)
                  THEN abr_name ELSE crawl_name END, CAST(w + 1 AS INT),
             least(len(crawl_name), len(abr_name)))
    FROM (SELECT *, unnest(range(0, greatest(len(crawl_name), len(abr_name))
               - least(len(crawl_name), len(abr_name)) + 1)) AS w
          FROM fsc WHERE names_ok)),
dpin AS (SELECT crawl_url, abn, kind, widx, a, b,
           length(a) AS n, length(b) AS m FROM tasks),
dp(crawl_url, abn, kind, widx, a, b, n, m, d, prev2, prev1) AS (
  SELECT crawl_url, abn, kind, widx, a, b, n, m, 1,
    list_transform(range(0, n + 1), x -> 0),
    list_transform(range(0, n + 1), x -> 0)
  FROM dpin
  UNION ALL
  SELECT crawl_url, abn, kind, widx, a, b, n, m, d + 1, prev1,
    list_transform(range(0, n + 1), i ->
      CASE WHEN (d + 1 - i) < 1 OR (d + 1 - i) > m OR i < 1 THEN 0
           ELSE greatest(
             prev1[i],
             prev1[i + 1],
             prev2[i] + CASE WHEN substr(a, i, 1) = substr(b, d + 1 - i, 1)
                             THEN 1 ELSE 0 END)
      END)
  FROM dp WHERE d < n + m),
lcsr AS (
  SELECT crawl_url, abn, kind, widx, n, m,
    CASE WHEN n = 0 OR m = 0 THEN 0 ELSE prev1[n + 1] END AS l
  FROM dp WHERE d = greatest(n + m, 1)),
kv AS (
  SELECT crawl_url, abn, kind,
    CASE WHEN n + m = 0 THEN 1.0
         ELSE 1.0 - CAST(n + m - 2 * l AS DOUBLE) / (n + m) END AS v
  FROM lcsr WHERE kind <> 'pw'),
pw AS (
  SELECT crawl_url, abn, max(l) AS bl, min(m) AS pm
  FROM lcsr WHERE kind = 'pw' GROUP BY 1, 2),
wide AS (
  SELECT f.crawl_url, f.abn, f.names_ok, f.t1, f.t2, f.si, f.dd1, f.dd2,
    f.wnorm, f.anorm, f.state_std, f.postcode_std, f.raw_text,
    coalesce(fz.v, 0.0) AS r_fz, coalesce(ts.v, 0.0) AS r_ts,
    i1.v AS r_i1, i2.v AS r_i2, ddv.v AS r_dd,
    coalesce(dm.v, 0.0) AS domain_name_match,
    CASE WHEN p.bl IS NULL THEN 0.0
         ELSE 1.0 - CAST(2 * (p.pm - p.bl) AS DOUBLE) / (2 * p.pm)
    END AS name_partial_ratio,
    CASE WHEN f.names_ok AND f.wnorm = f.anorm THEN 1.0 ELSE 0.0
    END AS name_exact_match,
    CASE WHEN f.dom_ok
           AND len(list_filter(string_split_regex(lower(f.anorm), '\s+'),
             p -> len(p) >= 4 AND contains(f.dom, p))) > 0
         THEN 1.0 ELSE 0.0 END AS domain_contains_name,
    CASE WHEN f.raw_text IS NOT NULL AND f.raw_text <> ''
           AND f.state_std IS NOT NULL AND f.state_std <> ''
           AND (CASE upper(f.state_std)
                WHEN 'NSW' THEN contains(lower(f.raw_text),'nsw') OR contains(lower(f.raw_text),'new south wales') OR contains(lower(f.raw_text),'sydney')
                WHEN 'VIC' THEN contains(lower(f.raw_text),'vic') OR contains(lower(f.raw_text),'victoria') OR contains(lower(f.raw_text),'melbourne')
                WHEN 'QLD' THEN contains(lower(f.raw_text),'qld') OR contains(lower(f.raw_text),'queensland') OR contains(lower(f.raw_text),'brisbane')
                WHEN 'SA'  THEN contains(lower(f.raw_text),'south australia') OR contains(lower(f.raw_text),'adelaide')
                WHEN 'WA'  THEN contains(lower(f.raw_text),'western australia') OR contains(lower(f.raw_text),'perth')
                WHEN 'TAS' THEN contains(lower(f.raw_text),'tasmania') OR contains(lower(f.raw_text),'hobart')
                WHEN 'NT'  THEN contains(lower(f.raw_text),'northern territory') OR contains(lower(f.raw_text),'darwin')
                WHEN 'ACT' THEN contains(lower(f.raw_text),'act') OR contains(lower(f.raw_text),'canberra') OR contains(lower(f.raw_text),'australian capital')
                ELSE contains(lower(f.raw_text), lower(f.state_std)) END)
         THEN 1.0 ELSE 0.0 END AS state_mentioned,
    CASE WHEN f.raw_text IS NOT NULL AND f.raw_text <> ''
           AND f.postcode_std IS NOT NULL AND f.postcode_std <> ''
           AND contains(f.raw_text, f.postcode_std)
         THEN 1.0 ELSE 0.0 END AS postcode_mentioned
  FROM fsc f
  LEFT JOIN kv fz ON fz.crawl_url = f.crawl_url AND fz.abn = f.abn AND fz.kind = 'fz'
  LEFT JOIN kv ts ON ts.crawl_url = f.crawl_url AND ts.abn = f.abn AND ts.kind = 'ts'
  LEFT JOIN kv i1 ON i1.crawl_url = f.crawl_url AND i1.abn = f.abn AND i1.kind = 'i1'
  LEFT JOIN kv i2 ON i2.crawl_url = f.crawl_url AND i2.abn = f.abn AND i2.kind = 'i2'
  LEFT JOIN kv ddv ON ddv.crawl_url = f.crawl_url AND ddv.abn = f.abn AND ddv.kind = 'dd'
  LEFT JOIN kv dm ON dm.crawl_url = f.crawl_url AND dm.abn = f.abn AND dm.kind = 'dm'
  LEFT JOIN pw p ON p.crawl_url = f.crawl_url AND p.abn = f.abn),
final AS (
  SELECT crawl_url, abn, r_fz AS name_fuzzy_ratio,
    r_ts AS name_token_sort,
    CASE WHEN NOT names_ok OR len(t1) = 0 OR len(t2) = 0 THEN 0.0
         WHEN si <> '' AND (dd1 = '' OR dd2 = '') THEN 1.0
         ELSE greatest(greatest(r_i1, r_i2), r_dd)
    END AS name_token_set,
    name_partial_ratio, domain_name_match,
    name_exact_match, domain_contains_name, state_mentioned,
    postcode_mentioned
  FROM wide)
SELECT crawl_url, abn, name_fuzzy_ratio, name_token_sort, name_token_set,
  name_partial_ratio, domain_name_match,
  (name_exact_match * CAST(0.30 AS DOUBLE)
   + name_token_sort * CAST(0.20 AS DOUBLE)
   + name_token_set * CAST(0.15 AS DOUBLE)
   + domain_name_match * CAST(0.15 AS DOUBLE)
   + domain_contains_name * CAST(0.10 AS DOUBLE)
   + state_mentioned * CAST(0.05 AS DOUBLE)
   + postcode_mentioned * CAST(0.05 AS DOUBLE)) / CAST(1.0 AS DOUBLE)
    AS match_probability
FROM final ORDER BY crawl_url, abn"""

  /** Multimodal demo payload is encode(text) and the documents corpus is
    * pure ASCII (verified at sf0.01/0.1), so DuckDB's VARCHAR md5/substr
    * mirror Spark's byte-level ops exactly. */
  val multimodalMeta: String = """SELECT doc_id,
  octet_length(encode(text)) AS byte_len,
  md5(text) AS md5,
  upper(hex(substr(text, 1, 4))) AS magic
FROM documents ORDER BY doc_id"""

  /** Mirrors multimodal_video_meta: the synthetic containers' header
    * fields are pure arithmetic over (doc_id, text byte length), so the
    * real ISO-BMFF box-walk / RIFF-AVI header parse is verified
    * value-exact. Duration doubles use the parser's multiply-then-
    * divide order — bit-identical IEEE, no rounding needed. */
  val multimodalVideoMeta: String = """SELECT doc_id,
  TRUE AS decoded,
  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'AVI ' END AS brand,
  CASE WHEN doc_id % 2 = 0
       THEN CAST(greatest(1, strlen(coalesce(text, ''))) * 25 AS DOUBLE) * 1000.0 / 600.0
       ELSE 33333.0 * CAST(greatest(1, strlen(coalesce(text, '')) // 64) AS DOUBLE) / 1000.0
  END AS duration_ms,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 3 ELSE 1 + doc_id % 2 END AS INT) AS n_tracks
FROM documents ORDER BY doc_id"""

  val multimodalFrames: String = """SELECT doc_id, CAST(i AS INT) AS frame_idx,
  md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5
FROM documents, unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS t(i)
WHERE i % 4 = 0
ORDER BY doc_id, frame_idx"""

  val cleanWeb: String = prelude +
    """SELECT crawl_url, clean_name, normalized_name, industry_std, domain, is_au_domain, block_key
FROM cc_clean ORDER BY crawl_url"""

  val cleanAbr: String = prelude +
    """SELECT abn_clean, is_valid_abn, clean_name, normalized_name, entity_type_desc,
       status_std, state_std, postcode_std, start_date_parsed, block_key
FROM abr_clean ORDER BY abn_clean"""

  val entityMatch: String = prelude +
    """SELECT * FROM match ORDER BY crawl_url"""

  /** Independent check of the F19 token_sort_ratio kernel: InDel (LCS)
    * distance of token-sorted normalized names, computed in DuckDB as an
    * anti-diagonal DP inside a recursive CTE (each diagonal derives
    * elementwise from the previous two — no intra-step dependency).
    * Bounded to an md5-bucketed ~10% of crawl urls so the O(n·m) DP
    * stays cheap at the verify SF. Integer outputs — no float rounding;
    * token_sort_ratio = 1 − indel/total_len. */
  private def tokensortLcsCtes(sampled: Boolean): String = {
    val tokSort = (e: String) =>
      raw"""coalesce(array_to_string(list_sort(list_filter(string_split_regex($e, '\s+'), x -> x <> '')), ' '), '')"""
    // `sampled` keeps the md5-bucketed ~10% bound where the DP cost
    // matters (tokensort_indel's 10000-bucket arithmetic); the FULL
    // match spine (etl_match_tokensort) runs it unbounded — at the
    // verify SF the whole blocked candidate set is small enough for the
    // recursive-CTE DP (round-5 verdict #5).
    val sampleWhere = if (sampled)
      "\n  WHERE CAST(CAST('0x' || substr(md5(crawl_url), 1, 15) AS BIGINT) % 10000 AS BIGINT) < 1000"
    else ""
    prelude.replaceFirst("^WITH", "WITH RECURSIVE") + raw""",
tsw AS (
  SELECT crawl_url, clean_name AS crawl_name, block_key,
         ${tokSort("normalized_name")} AS wn
  FROM cc_clean$sampleWhere),
tsa AS (
  SELECT abn_clean AS abn, clean_name AS abr_name, block_key,
         ${tokSort("normalized_name")} AS an
  FROM abr_clean),
tsp AS (
  SELECT crawl_url, crawl_name, abn, abr_name, wn AS a, an AS b,
         length(wn) AS n, length(an) AS m
  FROM tsw JOIN tsa USING (block_key)),
lcs_dp(crawl_url, crawl_name, abn, abr_name, a, b, n, m, d, prev2, prev1) AS (
  SELECT crawl_url, crawl_name, abn, abr_name, a, b, n, m, 1,
    list_transform(range(0, n + 1), x -> 0),
    list_transform(range(0, n + 1), x -> 0)
  FROM tsp
  UNION ALL
  SELECT crawl_url, crawl_name, abn, abr_name, a, b, n, m, d + 1, prev1,
    list_transform(range(0, n + 1), i ->
      CASE WHEN (d + 1 - i) < 1 OR (d + 1 - i) > m OR i < 1 THEN 0
           ELSE greatest(
             prev1[i],
             prev1[i + 1],
             prev2[i] + CASE WHEN substr(a, i, 1) = substr(b, d + 1 - i, 1)
                             THEN 1 ELSE 0 END)
      END)
  FROM lcs_dp WHERE d < n + m),
lcs AS (
  SELECT crawl_url, crawl_name, abn, abr_name, n, m,
    CASE WHEN n = 0 OR m = 0 THEN 0 ELSE prev1[n + 1] END AS l
  FROM lcs_dp WHERE d = greatest(n + m, 1))"""
  }

  val tokensortIndel: String = tokensortLcsCtes(sampled = true) + """
SELECT crawl_url, abn, CAST(n + m - 2 * l AS INT) AS indel,
  CAST(n + m AS BIGINT) AS total_len
FROM lcs ORDER BY crawl_url, abn"""

  /** Tokensort match spine: kernel score recomputed as 1 − indel/total
    * (bit-identical IEEE doubles — Spark's kernel evaluates the same
    * expression), threshold 0.6, best-per-url argmax with the
    * (score DESC, abn) tie-break, match output schema. */
  private def tokensortMatchSpine(sampled: Boolean): String =
    tokensortLcsCtes(sampled) + """,
scored AS (
  SELECT crawl_url, crawl_name, abn, abr_name,
    CASE WHEN n = 0 OR m = 0 THEN 0.0
         ELSE 1.0 - CAST(n + m - 2 * l AS DOUBLE) / (n + m) END AS fuzzy_score
  FROM lcs)
SELECT crawl_url, crawl_name, abn, abr_name, fuzzy_score,
       CAST(NULL AS DOUBLE) AS llm_score, fuzzy_score AS final_score,
       'fuzzy' AS match_method
FROM scored WHERE fuzzy_score >= 0.6
QUALIFY row_number() OVER (PARTITION BY crawl_url ORDER BY fuzzy_score DESC, abn) = 1
ORDER BY crawl_url"""

  /** The md5-bucketed ~10% web-side spine (hash-green since round 5). */
  val tokensortMatchSample: String = tokensortMatchSpine(sampled = true)

  /** The FULL spine — retires etl_match_tokensort's rows-only status. */
  val tokensortMatchFull: String = tokensortMatchSpine(sampled = false)

  val goldenDim: String = prelude +
    """SELECT * FROM dim ORDER BY abn"""

  val matchStats: String = prelude + """SELECT
  w.total_web_companies, w.distinct_domains, w.au_domain_count,
  a.total_abr_entities, a.active_entities, a.states_covered,
  m.total_matches, m.high_confidence_matches, m.avg_match_score,
  m.min_match_score, m.max_match_score,
  CASE WHEN w.total_web_companies = 0 THEN NULL
       ELSE round(m.total_matches * 100.0 / w.total_web_companies, 4) END AS match_rate_pct,
  CASE WHEN m.total_matches = 0 THEN NULL
       ELSE round(m.high_confidence_matches * 100.0 / m.total_matches, 4) END AS high_conf_rate_pct
FROM
  (SELECT count(*) AS total_web_companies, count(DISTINCT domain) AS distinct_domains,
          CAST(count(*) FILTER (WHERE is_au_domain) AS BIGINT) AS au_domain_count
   FROM cc_clean) w,
  (SELECT count(*) AS total_abr_entities,
          CAST(count(*) FILTER (WHERE status_std = 'Active') AS BIGINT) AS active_entities,
          count(DISTINCT state_std) AS states_covered
   FROM abr_clean) a,
  (SELECT count(*) AS total_matches,
          CAST(count(*) FILTER (WHERE final_score >= 0.9) AS BIGINT) AS high_confidence_matches,
          round(avg(final_score), 4) AS avg_match_score,
          round(min(final_score), 4) AS min_match_score,
          round(max(final_score), 4) AS max_match_score
   FROM match) m"""

  /** jsonb_object_agg shape (fct_match_statistics.sql:85-89): build the
    * {"STATE":count,...} string with deterministic (sorted) key order to
    * match Spark's to_json(map_from_entries(array_sort(...))). */
  val stateBreakdownJson: String = prelude +
    """SELECT '{' || string_agg('"' || state_std || '":' || cnt, ',' ORDER BY state_std) || '}' AS state_breakdown
FROM (SELECT state_std, count(*) AS cnt FROM mjoin
      WHERE state_std IS NOT NULL GROUP BY state_std)"""

  val matchesByState: String = prelude +
    """SELECT state_std AS state, count(*) AS match_count
FROM mjoin GROUP BY 1 ORDER BY match_count DESC, state NULLS FIRST"""

  val revenueBySegment: String = """SELECT c_mktsegment,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  val rollupRevenue: String = """SELECT c_mktsegment AS segment, o_orderstatus AS status,
  count(*) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
ORDER BY segment NULLS FIRST, status NULLS FIRST"""

  val cubeRevenue: String = """SELECT c_mktsegment AS segment, o_orderstatus AS status,
  count(*) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
ORDER BY segment NULLS FIRST, status NULLS FIRST"""

  val pivotStatusBySegment: String = """SELECT c_mktsegment AS segment,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY segment"""

  val movingAvgDailyRevenue: String = """WITH daily AS (
  SELECT o_orderdate AS day,
         sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev_dec
  FROM orders GROUP BY o_orderdate)
SELECT day, CAST(rev_dec AS DOUBLE) AS revenue,
  round(CAST(sum(rev_dec) OVER w7 AS DOUBLE) / count(*) OVER w7, 4) AS ma7,
  CAST(sum(rev_dec) OVER wc AS DOUBLE) AS cum_revenue
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       wc AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
ORDER BY day"""

  val resampleDailyRevenue: String = """WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1),
cal AS (
  SELECT CAST(unnest(generate_series(
    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
    INTERVAL 1 DAY)) AS DATE) AS day)
SELECT cal.day,
  last_value(daily.revenue IGNORE NULLS) OVER (
    ORDER BY cal.day ROWS UNBOUNDED PRECEDING) AS revenue_filled,
  daily.revenue IS NULL AS is_gap
FROM cal LEFT JOIN daily ON cal.day = daily.day
ORDER BY cal.day"""

  val unpivotStatusCounts: String = """WITH wide AS (
  SELECT o_orderpriority AS priority,
    count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
    count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
    count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
  FROM orders GROUP BY 1)
SELECT priority, status, n
FROM wide UNPIVOT (n FOR status IN ("F", "O", "P"))
ORDER BY priority, status"""

  val setIntersectCustomers: String = """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey"""

  val setExceptNations: String = """SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey"""

  val tokenFreqTop50: String = raw"""SELECT token, count(*) AS n
FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
      FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT 50"""

  val zscoreAcctbal: String = """SELECT c_custkey, c_mktsegment,
  round((c_acctbal - avg(c_acctbal) OVER w) /
        stddev_samp(c_acctbal) OVER w, 4) AS z
FROM customer WINDOW w AS (PARTITION BY c_mktsegment)
ORDER BY c_custkey"""

  val windowPercentiles: String = """SELECT c_custkey, c_mktsegment,
  round(percent_rank() OVER w, 6) AS pr,
  round(cume_dist() OVER w, 6) AS cd,
  CAST(ntile(4) OVER w AS INT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey"""

  val statsCorrLineitem: String = """SELECT l_returnflag,
  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
  round(stddev_samp(l_quantity), 4) AS sd_qty,
  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  val collectNamesBySegment: String = """SELECT c_mktsegment AS segment,
  count(*) AS n,
  string_agg(c_name, ',' ORDER BY c_name) AS names
FROM customer GROUP BY c_mktsegment ORDER BY segment"""

  /** Exact-regime oracle for the Misra-Gries aggregate: with k larger
    * than the distinct-item count no decrement fires, so the sketch IS
    * the exact group-by count. */
  val heavyHittersEvents: String = """SELECT event_type AS item, count(*) AS n
FROM events GROUP BY event_type ORDER BY n DESC, item"""

  /** The shared replayable deterministic-HLL chain over a `(grp, item)`
    * relation: the md5-prefix 60-bit hash, p=10 register construction
    * (idx = top 10 bits, rho = leading zeros of the 50-bit suffix + 1,
    * register-wise max), the exact Σ2^(51−r) BIGINT fold, the raw
    * harmonic estimate with the linear-counting small-range branch, and
    * the relative error vs the exact distinct count. Constant
    * expressions are written in the engine's association order so the
    * doubles match bit-for-bit. Ends in `rep(grp, n_est, n_exact,
    * rel_err)`. */
  private def hllReportCtes(srcSql: String): String = s"""src AS ($srcSql),
hh AS (SELECT grp,
    CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) AS h
  FROM src WHERE item IS NOT NULL),
rr AS (SELECT grp, h >> 50 AS idx,
    CASE WHEN (h & ((1::BIGINT << 50) - 1)) = 0 THEN 51
         ELSE 50 - length(bin(h & ((1::BIGINT << 50) - 1))) + 1 END AS rho
  FROM hh),
mx AS (SELECT grp, idx, max(rho) AS r FROM rr GROUP BY 1, 2),
grid AS (SELECT et.grp, t.i AS idx
  FROM (SELECT DISTINCT grp FROM src) et
  CROSS JOIN range(1024) t(i)),
regs AS (SELECT grid.grp, coalesce(mx.r, 0) AS r
  FROM grid LEFT JOIN mx
    ON mx.grp = grid.grp AND mx.idx = grid.idx),
est0 AS (SELECT grp,
    CAST(sum(CAST(power(2, 51 - r) AS BIGINT)) AS BIGINT) AS s,
    CAST(count(*) FILTER (WHERE r = 0) AS BIGINT) AS v
  FROM regs GROUP BY 1),
ex AS (SELECT grp, CAST(count(DISTINCT item) AS BIGINT) AS n_exact
       FROM src GROUP BY 1),
fin AS (SELECT est0.grp,
    round(CASE WHEN v > 0 AND
        (((0.7213/(1 + 1.079/1024.0)) * 1024 * 1024) * power(2.0, 51))
          / CAST(s AS DOUBLE) <= 2560.0
      THEN 1024.0 * ln(1024.0 / CAST(v AS DOUBLE))
      ELSE (((0.7213/(1 + 1.079/1024.0)) * 1024 * 1024) * power(2.0, 51))
        / CAST(s AS DOUBLE) END, 4) AS n_est,
    ex.n_exact
  FROM est0 JOIN ex ON ex.grp = est0.grp),
rep AS (SELECT grp, n_est, n_exact,
    round(abs(n_est - n_exact) / n_exact, 4) AS rel_err
  FROM fin)"""

  /** approx_distinct_events: distinct users per event type. */
  val approxDistinctEvents: String = s"""WITH ${hllReportCtes(
    "SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS item FROM events")}
SELECT grp AS event_type, n_est, n_exact, rel_err FROM rep ORDER BY 1"""

  /** approx_distinct_tokens: distinct-token (vocab) estimate per
    * language — the token-grain profile where exact COUNT(DISTINCT)
    * shuffles every key. */
  val approxDistinctTokens: String = s"""WITH ${hllReportCtes(
    raw"SELECT lang AS grp, unnest(list_filter(" +
      raw"regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS item " +
      "FROM documents")}
SELECT grp AS lang, n_est, n_exact, rel_err FROM rep ORDER BY 1"""

  /** The unbounded-grain demo SIGNAL for the quantile-sketch queries:
    * IEEE double division of exact integers — bit-identical in any
    * IEEE-754 engine, unlike a transcendental score. */
  private val qScored = """SELECT lang, CAST(doc_id AS VARCHAR) AS key,
    CAST(n_chars AS DOUBLE) / CAST(doc_id % 7 + 1 AS DOUBLE) AS score
  FROM documents"""

  /** Replay of the deterministic bottom-k quantile sample
    * (`QuantileSketchValues`): per group the k rows with the smallest
    * (md5-prefix hash, value), the value-sorted sample, and the lower
    * nearest-rank estimates — the whole chain is integer + IEEE-double
    * picking, no interpolation, so the doubles match bit-for-bit. */
  val approxQuantileScores: String = s"""WITH scored AS ($qScored),
hq AS (SELECT lang, score,
    CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h
  FROM scored WHERE score IS NOT NULL),
sm AS (SELECT lang, score FROM hq
  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, score) <= 64),
srt AS (SELECT lang, list(score ORDER BY score) AS vs,
    CAST(count(*) AS BIGINT) AS ns
  FROM sm GROUP BY 1),
cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM scored GROUP BY 1)
SELECT c.lang, c.n_docs,
  vs[CAST(floor(0.5 * CAST(ns - 1 AS DOUBLE)) AS BIGINT) + 1] AS p50,
  vs[CAST(floor(0.9 * CAST(ns - 1 AS DOUBLE)) AS BIGINT) + 1] AS p90,
  vs[CAST(floor(0.99 * CAST(ns - 1 AS DOUBLE)) AS BIGINT) + 1] AS p99
FROM srt JOIN cnt c USING (lang) ORDER BY lang"""

  /** Error mart for the quantile sketch (the `approx_distinct_events`
    * discipline): global k=256 sample, five estimates, each estimate's
    * EMPIRICAL RANK in the full data (count(score <= est)/n) and the
    * |rank − q| error — the quantity the ~1/sqrt(k) envelope bounds. */
  val approxQuantileError: String = s"""WITH scored AS ($qScored),
hq AS (SELECT score,
    CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h
  FROM scored WHERE score IS NOT NULL),
sm AS (SELECT score FROM hq
  QUALIFY row_number() OVER (ORDER BY h, score) <= 256),
srt AS (SELECT list(score ORDER BY score) AS vs,
    CAST(count(*) AS BIGINT) AS ns FROM sm),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
    CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE),
    CAST(0.99 AS DOUBLE)]) AS q),
est AS (SELECT q,
    vs[CAST(floor(q * CAST(ns - 1 AS DOUBLE)) AS BIGINT) + 1] AS est,
    nn.n
  FROM qs CROSS JOIN srt CROSS JOIN nn),
rep AS (SELECT q, est, n,
    CAST((SELECT count(*) FROM scored WHERE score <= est) AS BIGINT) AS le
  FROM est)
SELECT q, est,
  CAST(le AS DOUBLE) / CAST(n AS DOUBLE) AS rank_hat,
  round(abs(CAST(le AS DOUBLE) / CAST(n AS DOUBLE) - q), 4) AS rank_err
FROM rep ORDER BY q"""

  /** Replay of `Sampling.topFractionBySketch` (permille=100, k=256):
    * the global bottom-k sample, the lower nearest-rank p90 threshold,
    * and the tie-inclusive `score >= thr` filter. */
  val topFractionSketch: String = s"""WITH scored AS ($qScored),
hq AS (SELECT CAST(key AS BIGINT) AS doc_id, score,
    CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h
  FROM scored WHERE score IS NOT NULL),
sm AS (SELECT score FROM hq
  QUALIFY row_number() OVER (ORDER BY h, score) <= 256),
srt AS (SELECT list(score ORDER BY score) AS vs,
    CAST(count(*) AS BIGINT) AS ns FROM sm),
thr AS (SELECT
    vs[CAST(floor(0.9 * CAST(ns - 1 AS DOUBLE)) AS BIGINT) + 1] AS t
  FROM srt)
SELECT hq.doc_id, hq.score FROM hq CROSS JOIN thr
WHERE hq.score >= thr.t ORDER BY hq.doc_id"""

  /** Replay of `Sampling.topFractionBySketchBy` (strata=lang,
    * permille=100, k=64): one bottom-k sample PER LANGUAGE, each
    * language cut at its own lower nearest-rank p90. */
  val topFractionSketchByLang: String = s"""WITH scored AS ($qScored),
hq AS (SELECT lang, CAST(key AS BIGINT) AS doc_id, score,
    CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h
  FROM scored WHERE score IS NOT NULL),
sm AS (SELECT lang, score FROM hq
  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, score) <= 64),
srt AS (SELECT lang, list(score ORDER BY score) AS vs,
    CAST(count(*) AS BIGINT) AS ns FROM sm GROUP BY 1),
thr AS (SELECT lang,
    vs[CAST(floor(0.9 * CAST(ns - 1 AS DOUBLE)) AS BIGINT) + 1] AS t
  FROM srt)
SELECT hq.lang, hq.doc_id, hq.score FROM hq JOIN thr USING (lang)
WHERE hq.score >= thr.t ORDER BY hq.doc_id"""

  /** Same md5-prefix hash bucket as Sampling.bucket. */
  private val sampleBucket =
    "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS BIGINT)"

  val sampleDocuments: String = s"""SELECT doc_id FROM documents
WHERE $sampleBucket < 1000 ORDER BY doc_id"""

  val splitDocuments: String = s"""SELECT CASE
    WHEN $sampleBucket < 8000 THEN 'train'
    WHEN $sampleBucket < 9000 THEN 'val'
    WHEN $sampleBucket < 10000 THEN 'test'
    ELSE 'holdout' END AS split, count(*) AS n
FROM documents GROUP BY split ORDER BY split"""

  /** Mirrors Sampling.byMixture(en 0.5 / de 0.3 / fr 0.2, 20%): same
    * literal arithmetic shape for the in-plan per-class rate so constant
    * folding yields identical doubles, then the shared hash bucket. */
  val sampleMixture: String = s"""WITH counts AS (
  SELECT lang AS cls, count(*) AS cn FROM documents GROUP BY 1),
tot AS (SELECT count(*) AS total FROM documents),
r AS (SELECT d.doc_id, d.lang,
        least(1.0, 0.2 * total *
          (CASE d.lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3
                       WHEN 'fr' THEN 0.2 ELSE 0.0 END) / cn) AS rate
      FROM documents d JOIN counts ON d.lang = cls CROSS JOIN tot)
SELECT lang, count(*) AS n FROM r
WHERE $sampleBucket < greatest(CAST(floor(rate * 10000) AS BIGINT),
  CASE WHEN rate > 0 THEN 1 ELSE 0 END)
GROUP BY lang ORDER BY lang"""

  /** Mirrors Sampling.byTemperature(outFraction 0.3, τ 0.5): per-class
    * weight is the INTEGER ⌊√n_c⌋ (exact in both engines below 2⁵²), the
    * normalizer an exact integer sum, and the rate arithmetic written in
    * the engine's exact left-associative order — so the keep decision is
    * bit-identical. */
  val sampleTemperature: String = s"""WITH counts AS (
  SELECT lang AS cls, count(*) AS cn FROM documents GROUP BY 1),
w AS (SELECT cls, cn,
        CAST(floor(sqrt(CAST(cn AS DOUBLE))) AS BIGINT) AS wt
      FROM counts),
nrm AS (SELECT sum(wt) AS wsum, sum(cn) AS total FROM w),
r AS (SELECT d.doc_id, d.lang,
        least(CAST(1.0 AS DOUBLE),
          CAST(0.3 AS DOUBLE) * CAST(total AS DOUBLE) * CAST(wt AS DOUBLE)
            / CAST(wsum AS DOUBLE) / CAST(cn AS DOUBLE)) AS rate
      FROM documents d JOIN w ON d.lang = cls CROSS JOIN nrm)
SELECT lang, count(*) AS n FROM r
WHERE $sampleBucket < greatest(
  CAST(floor(rate * CAST(10000 AS DOUBLE)) AS BIGINT),
  CASE WHEN rate > 0 THEN 1 ELSE 0 END)
GROUP BY lang ORDER BY lang"""

  /** Mirrors Sampling.repeatByFactor(en 2.5 / de 1.0 / fr 0.25): ⌊f⌋
    * copies + one more where the shared hash bucket clears frac(f)·10⁴
    * (floor-then-cast both sides — DuckDB's bare double→BIGINT cast
    * ROUNDS where Spark truncates), lateral range for the copy index. */
  val sampleUpsampled: String = s"""WITH r AS (
  SELECT doc_id, lang,
    CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.0
              WHEN 'fr' THEN 0.25 ELSE 1.0 END AS f,
    $sampleBucket AS bk
  FROM documents),
c AS (SELECT doc_id, lang,
        CAST(floor(f) AS BIGINT) +
        (CASE WHEN bk < CAST(floor((f - floor(f)) * 10000) AS BIGINT)
              THEN 1 ELSE 0 END) AS reps
      FROM r)
SELECT doc_id, lang, rep FROM c, unnest(range(0, reps)) AS t(rep)
WHERE reps > 0 ORDER BY doc_id, rep"""

  /** Shared URL/domain CTEs: the synthesized crawl URL (byte-identical
    * to SparkEntry.docsWithUrl's concat) and Text.extractDomain's
    * host-regex + www-strip + lower, replayed in RE2. */
  private val domainCtes: String = raw"""u AS (
  SELECT doc_id,
    'https://www.' || source || '-' || CAST(doc_id % 5 AS VARCHAR)
      || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
d AS (
  SELECT doc_id,
    lower(regexp_replace(regexp_extract(url, '://([^/?#]+)', 1),
      '^www\.', '')) AS domain
  FROM u)"""

  /** Mirrors `curate_domain_filter`: blocklist drop + suffix gate over
    * the extracted domain. */
  val curateDomainFilter: String = s"""WITH $domainCtes
SELECT doc_id, domain FROM d
WHERE domain NOT IN ('src0-0.example.com', 'src7-3.example.com',
                     'src15-2.example.com')
  AND ends_with(domain, '.example.com')
ORDER BY doc_id"""

  /** Mirrors `sample_domain_cap`: at most 2 docs per domain by the
    * md5-bucket rank with doc_id ties — Sampling.balanced replayed. */
  val sampleDomainCap: String = s"""WITH $domainCtes,
rk AS (
  SELECT doc_id, domain,
    row_number() OVER (PARTITION BY domain ORDER BY
      CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        AS BIGINT) % 10000 AS BIGINT), doc_id) AS rn
  FROM d)
SELECT doc_id, domain FROM rk WHERE rn <= 2 ORDER BY doc_id"""

  val sampleStratified: String = """SELECT c_mktsegment AS segment, count(*) AS n
FROM customer
WHERE CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS BIGINT)
      < (CASE WHEN c_mktsegment = 'BUILDING' THEN 4000 ELSE 1000 END)
GROUP BY segment ORDER BY segment"""

  /** Mirrors GraftFunctions.normalize_text: NFC → lower → Java-\s
    * collapse → trim, then the digest. The whitespace class is spelled
    * out ([ \t\n\r\f\x0b]+) because RE2's \s lacks \v where Java's (the
    * kernel's) includes it. DuckDB's nfc_normalize/lower are utf8proc;
    * the kernel documents the one divergence (Greek final sigma) —
    * absent from the corpus and from any per-codepoint text. */
  val normalizeDocuments: String = raw"""SELECT doc_id,
  md5(trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\n\r\f\x0b]+', ' ', 'g')))
    AS norm_md5,
  CAST(length(trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\n\r\f\x0b]+', ' ',
    'g'))) AS BIGINT) AS n_norm_chars
FROM documents ORDER BY doc_id"""

  /** Mirrors the corpus data card: exact integer aggregates over the
    * documents table + the exact-dup group relation. */
  val corpusDatacard: String = raw"""WITH base AS (
  SELECT count(*) AS n_docs,
    count(DISTINCT lang) AS n_langs,
    count(DISTINCT source) AS n_sources,
    CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
      x -> x <> ''))) AS BIGINT) AS total_tokens,
    CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents),
g AS (SELECT md5(text) AS h, count(*) AS n_copies FROM documents GROUP BY 1),
dups AS (SELECT count(*) AS n_distinct_texts,
           CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END)
             AS BIGINT) AS n_exact_dup_docs
         FROM g)
SELECT * FROM base CROSS JOIN dups"""

  /** Mirrors ZOrder.zValue over the orders keys — the fold is emitted
    * from the SAME Scala definition as the engine expression. */
  val zorderOrders: String = s"""SELECT o_orderkey, o_custkey,
  ${graft.operators.ZOrder.oracleExpr("o_orderkey", "o_custkey")} AS z
FROM orders ORDER BY o_orderkey"""

  val revenueByMonth: String = """SELECT strftime(o_orderdate, '%Y-%m') AS month,
  count(*) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY month ORDER BY month"""

  val quantilesPriceBySegment: String = """SELECT c_mktsegment,
  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  val top3OrdersPerCustomer: String ="""SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders) t
WHERE rank <= 3 ORDER BY o_custkey, rank"""

  val customersWithoutOrders: String = """SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey"""

  val semiCustomersPending: String = """SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey"""

  val fullouterNationCounts: String = """WITH c AS (
  SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1),
s AS (
  SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(nk_c, nk_s) AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON nk_c = nk_s
ORDER BY nationkey"""

  val levenshteinNames: String = """SELECT c_custkey, c_name,
  levenshtein(c_name, reverse(c_name)) AS lev
FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""

  val latestEventPerUser: String = """SELECT user_id, event_id, ts, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id"""

  /** Gap-based sessionization (30-min gap), mirroring
    * Streams.Batch.sessionize: a row starts a new session when its
    * millisecond gap to the previous event of the same user exceeds the
    * threshold; session ids are running sums of the start flags. */
  val sessionizeEvents: String = """WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM e)
SELECT user_id AS key, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, sum(value) AS sum_value
FROM s GROUP BY user_id, sid
ORDER BY key, session_start"""

  /** Forward as-of: DuckDB ASOF with the reversed inequality picks the
    * earliest right timestamp at-or-after each left row. */
  val asofForwardPurchaseClick: String = """SELECT p.event_id, p.user_id, p.ts, p.value,
  c.ts AS click_ts, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY p.event_id"""

  /** DuckDB's native ASOF LEFT JOIN oracles Relational.asofJoin. */
  val asofPurchaseClick: String = """SELECT p.event_id, p.user_id, p.ts, p.value,
  c.ts AS click_ts, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id"""

  /** Events joined into their containing session interval
    * (Relational.rangeJoin over Streams.Batch.sessionize output). */
  val rangeJoinEventSessions: String = """WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM e),
sess AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM s GROUP BY user_id, sid)
SELECT ev.event_id, ev.user_id, ev.ts,
       sx.session_start, sx.session_end, sx.n_events
FROM events ev
JOIN sess sx ON ev.user_id = sx.user_id
  AND ev.ts BETWEEN sx.session_start AND sx.session_end
ORDER BY ev.event_id"""

  val eventsJsonHourly: String = """SELECT event_type,
  date_trunc('hour', ts) AS hour,
  count(*) AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type, hour
ORDER BY event_type, hour"""

  val unionDistinctNames: String = """SELECT c_name AS name FROM customer
UNION SELECT s_name AS name FROM supplier ORDER BY name"""

  val topkOrdersGlobal: String = """SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""

  val q1Agg: String = """SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
  count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""
}
