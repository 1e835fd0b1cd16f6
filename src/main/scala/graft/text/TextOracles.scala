package graft.text

import graft.embeddings.EmbeddingOps

/** DuckDB oracle SQL mirroring [[TextAnalysis]] and
  * [[graft.embeddings.EmbeddingOps]]. Folds are written with
  * list_reduce (left-to-right, acc seeded by the first element — IEEE
  * equivalent to Spark's aggregate with 0.0 seed). */
object TextOracles {

  private val toks =
    raw"""list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"""

  private def inList(items: Seq[String]): String =
    items.map(s => s"'$s'").mkString("[", ",", "]")

  private val langHits = TextAnalysis.LangMarkers.map { case (lang, markers) =>
    s"len(list_filter(toks, t -> list_contains(${inList(markers)}, t))) AS ${lang}_h"
  }.mkString(",\n  ")

  val analysis: String = raw"""WITH t AS (
  SELECT doc_id, text, $toks AS toks FROM documents),
s AS (SELECT doc_id, text, toks,
  len(text) AS n_chars,
  len(toks) AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
  CASE WHEN len(text) = 0 THEN 0.0
       ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / len(text) END AS pr,
  CASE WHEN len(toks) = 0 THEN 0.0
       ELSE CAST(len(list_filter(toks, t -> list_contains(${inList(TextAnalysis.Stopwords)}, t))) AS DOUBLE) / len(toks) END AS sr,
  CASE WHEN len(toks) = 0 THEN 0.0
       ELSE CAST(list_reduce(list_transform(toks, t -> len(t)), (a,b) -> a + b) AS DOUBLE) / len(toks) END AS ml,
  $langHits
  FROM t),
q AS (SELECT *,
  least(CAST(n_chars AS DOUBLE) / 200.0, 1.0) AS len_score,
  least(sr * 5.0, 1.0) AS stop_score,
  CASE WHEN ml BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END AS word_score,
  least(pr * 5.0, 1.0) AS punct_pen
  FROM s)
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens,
  round(pr, 4) AS punct_ratio,
  round(sr, 4) AS stopword_ratio,
  round((len_score * 0.3 + stop_score * 0.3 + word_score * 0.4) * (1.0 - punct_pen * 0.5), 4) AS quality_score,
  CASE WHEN greatest(en_h, es_h, de_h, fr_h, zh_h) > 0 THEN
    CASE WHEN en_h >= greatest(es_h, de_h, fr_h, zh_h) THEN 'en'
         WHEN es_h >= greatest(de_h, fr_h, zh_h) THEN 'es'
         WHEN de_h >= greatest(fr_h, zh_h) THEN 'de'
         WHEN fr_h >= zh_h THEN 'fr' ELSE 'zh' END
    ELSE 'und' END AS lang_pred,
  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
  CASE WHEN len(text) = 0 THEN 0
       ELSE list_reduce(list_transform(range(1, len(text) + 1),
              i -> ord(substr(text, CAST(i AS BIGINT), 1))),
            (a,b) -> (CAST(a AS BIGINT) * 257 + b) % 1000000007) END AS rolling_fp
FROM q ORDER BY doc_id"""

  /** Mirrors TextAnalysis.gopherSignals: the published Gopher filter
    * rules (word/mean-length bounds, symbol ratios, bullet/ellipsis
    * line fractions, alpha-word fraction, stop-word presence). Ratios
    * round to 4 decimals BEFORE the threshold compare in BOTH engines;
    * the stop list is referenced from TextAnalysis so it cannot
    * drift. */
  val gopherQuality: String = raw"""WITH t AS (
  SELECT doc_id, text, $toks AS toks FROM documents),
s AS (SELECT doc_id, text, toks, len(toks) AS n_words,
  list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM t),
g AS (SELECT doc_id, n_words,
  CASE WHEN n_words = 0 THEN NULL
       ELSE round(CAST(list_reduce(list_transform(toks, x -> len(x)), (a,b) -> a + b) AS DOUBLE)
         / nullif(n_words, 0), 4) END AS mean_word_len,
  round(CAST(len(regexp_extract_all(text, '#')) AS DOUBLE)
    / nullif(n_words, 0), 4) AS hash_ratio,
  round(CAST(len(regexp_extract_all(text, '\.\.\.')) + len(regexp_extract_all(text, '…')) AS DOUBLE)
    / nullif(n_words, 0), 4) AS ellipsis_ratio,
  round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
    / nullif(len(lines), 0), 4) AS bullet_line_frac,
  round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$$'))) AS DOUBLE)
    / nullif(len(lines), 0), 4) AS ellipsis_line_frac,
  round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
    / nullif(n_words, 0), 4) AS alpha_word_frac,
  len(list_intersect(list_distinct(toks), ${inList(TextAnalysis.GopherStops)})) AS n_stop_hits
  FROM s)
SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
  coalesce(n_words BETWEEN 50 AND 100000
    AND mean_word_len BETWEEN 3.0 AND 10.0
    AND hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1
    AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
    AND alpha_word_frac >= 0.8
    AND n_stop_hits >= ${TextAnalysis.GopherMinStopHits}, false) AS gopher_pass
FROM g ORDER BY doc_id"""

  /** Mirrors TextAnalysis.repetitionSignals: the Gopher repetition
    * table (dup-line fractions, top-{2,3,4}-gram char fractions,
    * dup-{5..10}-gram char fractions) with thresholds referenced from
    * TextAnalysis.GopherRepThresholds so they cannot drift. Same
    * definitions: overlapping n-gram windows, single-space joins,
    * total_chars = Σ token len + (n_toks − 1), ties for the top
    * n-gram broken by longer charlen (the emitted fraction depends
    * only on (cnt, charlen), so further ties are value-identical). */
  val gopherRepetition: String = {
    val th = TextAnalysis.GopherRepThresholds
    raw"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
b AS (SELECT doc_id, toks, len(toks) AS n_toks,
        CASE WHEN len(toks) = 0 THEN 0
             ELSE list_reduce(list_transform(toks, x -> len(x)), (a, b2) -> a + b2)
                  + greatest(len(toks) - 1, 0) END AS total_chars
      FROM t),
lo AS (SELECT doc_id,
         unnest(list_filter(string_split(text, chr(10)), x -> trim(x) <> '')) AS l
       FROM t),
lc AS (SELECT doc_id, l, count(*) AS cnt, len(l) AS llen
       FROM lo GROUP BY doc_id, l),
la AS (SELECT doc_id,
         round(CAST(sum(cnt) - count(*) AS DOUBLE) / sum(cnt), 4) AS dup_line_frac,
         round(CAST(sum((cnt - 1) * llen) AS DOUBLE) / nullif(sum(cnt * llen), 0), 4) AS dup_line_char_frac
       FROM lc GROUP BY doc_id),
ns AS (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n),
g0 AS (SELECT doc_id, total_chars, ns.n AS n,
         CASE WHEN n_toks >= ns.n THEN
           list_transform(range(0, n_toks - ns.n + 1),
             i -> array_to_string(list_slice(toks, i + 1, i + ns.n), ' '))
         ELSE [] END AS gl
       FROM b CROSS JOIN ns),
g AS (SELECT doc_id, total_chars, n, unnest(gl) AS g FROM g0),
c AS (SELECT doc_id, n, g, count(*) AS cnt, max(total_chars) AS tc
      FROM g GROUP BY doc_id, n, g),
p AS (SELECT doc_id, n, cnt, len(g) AS charlen, tc,
        row_number() OVER (PARTITION BY doc_id, n
          ORDER BY cnt DESC, len(g) DESC) AS rn
      FROM c),
tp AS (SELECT doc_id,
         max(CASE WHEN n = 2 THEN f END) AS top_2gram_char_frac,
         max(CASE WHEN n = 3 THEN f END) AS top_3gram_char_frac,
         max(CASE WHEN n = 4 THEN f END) AS top_4gram_char_frac
       FROM (SELECT doc_id, n,
               round(CAST(cnt * charlen AS DOUBLE) / nullif(tc, 0), 4) AS f
             FROM p WHERE rn = 1) GROUP BY doc_id),
dp AS (SELECT doc_id,
         max(CASE WHEN n = 5 THEN f END) AS dup_5gram_char_frac,
         max(CASE WHEN n = 6 THEN f END) AS dup_6gram_char_frac,
         max(CASE WHEN n = 7 THEN f END) AS dup_7gram_char_frac,
         max(CASE WHEN n = 8 THEN f END) AS dup_8gram_char_frac,
         max(CASE WHEN n = 9 THEN f END) AS dup_9gram_char_frac,
         max(CASE WHEN n = 10 THEN f END) AS dup_10gram_char_frac
       FROM (SELECT doc_id, n,
               round(CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * charlen ELSE 0 END) AS DOUBLE)
                     / nullif(max(tc), 0), 4) AS f
             FROM p GROUP BY doc_id, n) GROUP BY doc_id),
fin AS (SELECT b.doc_id,
         coalesce(dup_line_frac, 0.0) AS dup_line_frac,
         coalesce(dup_line_char_frac, 0.0) AS dup_line_char_frac,
         coalesce(top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
         coalesce(top_3gram_char_frac, 0.0) AS top_3gram_char_frac,
         coalesce(top_4gram_char_frac, 0.0) AS top_4gram_char_frac,
         coalesce(dup_5gram_char_frac, 0.0) AS dup_5gram_char_frac,
         coalesce(dup_6gram_char_frac, 0.0) AS dup_6gram_char_frac,
         coalesce(dup_7gram_char_frac, 0.0) AS dup_7gram_char_frac,
         coalesce(dup_8gram_char_frac, 0.0) AS dup_8gram_char_frac,
         coalesce(dup_9gram_char_frac, 0.0) AS dup_9gram_char_frac,
         coalesce(dup_10gram_char_frac, 0.0) AS dup_10gram_char_frac
       FROM b LEFT JOIN la USING (doc_id)
              LEFT JOIN tp USING (doc_id)
              LEFT JOIN dp USING (doc_id))
SELECT *,
  dup_line_frac <= ${th("dup_line_frac")}
    AND dup_line_char_frac <= ${th("dup_line_char_frac")}
    AND top_2gram_char_frac <= ${th("top_2gram_char_frac")}
    AND top_3gram_char_frac <= ${th("top_3gram_char_frac")}
    AND top_4gram_char_frac <= ${th("top_4gram_char_frac")}
    AND dup_5gram_char_frac <= ${th("dup_5gram_char_frac")}
    AND dup_6gram_char_frac <= ${th("dup_6gram_char_frac")}
    AND dup_7gram_char_frac <= ${th("dup_7gram_char_frac")}
    AND dup_8gram_char_frac <= ${th("dup_8gram_char_frac")}
    AND dup_9gram_char_frac <= ${th("dup_9gram_char_frac")}
    AND dup_10gram_char_frac <= ${th("dup_10gram_char_frac")} AS rep_pass
FROM fin ORDER BY doc_id"""
  }

  /** Mirrors the pii_redaction query: the same synthesized PII suffixes
    * and the SAME regex constants (referenced from TextAnalysis, so the
    * two engines cannot drift). DuckDB regexp_replace needs the 'g' flag
    * to match Spark's replace-all. */
  val piiRedaction: String = {
    val (e, ip, ph) =
      (TextAnalysis.EmailRe, TextAnalysis.Ipv4Re, TextAnalysis.PhoneRe)
    s"""WITH p AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 3 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         ELSE '' END ||
    CASE WHEN doc_id % 5 = 0
         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         ELSE '' END ||
    CASE WHEN doc_id % 7 = 0 THEN ' call +61 400 123 456' ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '$e')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(t, '$ip')) AS INTEGER) AS n_ips,
  CAST(len(regexp_extract_all(t, '$ph')) AS INTEGER) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
    '$e', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g'))
    AS redacted_md5
FROM p ORDER BY doc_id"""
  }

  /** Mirrors TextAnalysis.corpusStats over documents grouped by lang. */
  val corpusStats: String = raw"""WITH t AS (
  SELECT lang, text, $toks AS toks FROM documents)
SELECT lang,
  count(*) AS n_docs,
  CAST(sum(len(text)) AS BIGINT) AS total_chars,
  CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
  CAST(sum(len(toks)) AS DOUBLE) / count(*) AS mean_doc_tokens
FROM t GROUP BY lang ORDER BY lang"""

  /** Mirrors Relevance.topTerms(k=3): tf × ln(N/df) with rank ties broken
    * by term. */
  val tfidfTopTerms: String = raw"""WITH t AS (
  SELECT doc_id, $toks AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
x AS (SELECT doc_id, term, tf, df,
        round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, term) AS rank FROM x)
SELECT doc_id, term, tfidf, rank FROM r WHERE rank <= 3
ORDER BY doc_id, rank"""

  /** Mirrors Relevance.bm25("spark window merge", k1=1.2, b=0.75): the
    * same literal arithmetic shape so constant folding yields identical
    * doubles; per-term contributions summed as DECIMAL(28,6). */
  val bm25Search: String = bm25SearchOver("documents")

  /** [[bm25Search]] with a parameterized corpus relation — the
    * post-deletion serving oracle scores over the SURVIVING documents
    * only (df, n_docs and avgdl all shrink with the deletion, which is
    * exactly what the stats-layer repair must reproduce). */
  def bm25SearchOver(docRel: String): String = raw"""WITH t AS (
  SELECT doc_id, $toks AS toks FROM $docRel),
d AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
q AS (SELECT doc_id, dl, term FROM tok
      WHERE term IN ('spark', 'window', 'merge')),
tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
       FROM q GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
            CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM t),
c AS (SELECT doc_id,
        CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
          (tf * (1.2 + 1)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)), 6)
          AS DECIMAL(28,6)) AS c
      FROM tf JOIN df USING (term) CROSS JOIN stats)
SELECT doc_id, CAST(round(sum(c), 4) AS DOUBLE) AS score
FROM c GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors StreamingBm25Index.freshnessReport over the 3-epoch
    * (doc_id % 3) growing index: per epoch, document count, mean
    * document length and corpus share — the avgdl-drift gauge. Same
    * round(…, 4) + 0.0 pin as the Spark side. */
  val bm25IndexFreshness: String = raw"""WITH t AS (
  SELECT doc_id, $toks AS toks FROM documents),
b AS (SELECT doc_id % 3 AS batch_id, len(toks) AS dl FROM t),
e AS (SELECT batch_id, count(*) AS n_docs, sum(dl) AS sum_dl
      FROM b GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs FROM e)
SELECT batch_id, n_docs,
  round(CAST(sum_dl AS DOUBLE) / n_docs, 4) + 0.0 AS avgdl,
  round(CAST(n_docs AS DOUBLE) / t_docs, 4) + 0.0 AS doc_share
FROM e CROSS JOIN tot ORDER BY batch_id"""

  /** Mirrors Relevance.bm25MultiFromIndex over a literal query
    * relation: per-(query, doc) BM25 with the index's corpus-wide df
    * (for a term, the docs carrying it are the same set under every
    * query, so count(DISTINCT doc_id) per term IS the index df). */
  def bm25MultiSearch(queries: Seq[(Long, Seq[String])]): String = {
    val vals = queries.map { case (id, ts) =>
      s"($id, ${ts.map(t => s"'$t'").mkString("[", ",", "]")})"
    }.mkString(", ")
    raw"""WITH qrel(query_id, qterms) AS (VALUES $vals),
qt AS (SELECT query_id, unnest(qterms) AS term FROM qrel),
t AS (SELECT doc_id, $toks AS toks FROM documents),
d AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
q AS (SELECT qt.query_id, tok.doc_id, tok.dl, tok.term
      FROM tok JOIN qt USING (term)),
tf AS (SELECT query_id, doc_id, term, count(*) AS tf, min(dl) AS dl
       FROM q GROUP BY 1, 2, 3),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
            CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM t),
c AS (SELECT query_id, doc_id,
        CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
          (tf * (1.2 + 1)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)), 6)
          AS DECIMAL(28,6)) AS c
      FROM tf JOIN df USING (term) CROSS JOIN stats)
SELECT query_id, doc_id, CAST(round(sum(c), 4) AS DOUBLE) AS score
FROM c GROUP BY query_id, doc_id ORDER BY query_id, doc_id"""
  }

  /** GOLDEN oracle for extract_html_text: the demo page wraps each
    * document's text in one `<p>` block surrounded by planted
    * boilerplate (nav, link-dense cookie banner, footer, short title),
    * so the expected main content is exactly the whitespace-normalized
    * text when it carries >= minWords words, else empty — reconstructed
    * from the KNOWN structure, independent of the extraction kernel. */
  def extractHtmlText(minWords: Int = 3): String =
    raw"""SELECT doc_id,
  CASE WHEN len(list_filter(string_split(cl, ' '), x -> x <> ''))
         >= $minWords
       THEN cl ELSE '' END AS main_text
FROM (SELECT doc_id,
        trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')) AS cl
      FROM documents) q ORDER BY doc_id"""

  /** Shared CTE chain mirroring LanguageModel.scoreDocs(alpha=0.5),
    * ending in a relation `sc(doc_id, n_bigrams, lm_score)` — the prefix
    * of both the raw-score and perplexity-bucket oracles. */
  private val lmScoreCtes: String = raw"""t AS (
  SELECT doc_id, $toks AS toks FROM documents),
bg AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2 FROM t WHERE len(toks) >= 2),
cbg AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
ctx AS (SELECT w1, count(*) AS n FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS vsz
      FROM (SELECT unnest(toks) AS tok FROM t)),
j AS (SELECT doc_id,
        CAST(round(ln((c + 0.5) / (n + 0.5 * vsz)), 6)
          AS DECIMAL(28,6)) AS lp
      FROM bg JOIN cbg USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
j2 AS (SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(lp) * 1000000 AS BIGINT) AS s FROM j GROUP BY doc_id),
sc AS (SELECT doc_id, n_bigrams,
  (CASE WHEN s >= 0 THEN (2 * s + 100 * n_bigrams) // (200 * n_bigrams)
        ELSE -((2 * (-s) + 100 * n_bigrams) // (200 * n_bigrams)) END)
    / 10000.0 AS lm_score
FROM j2)"""

  /** Mirrors LanguageModel.scoreDocs(alpha=0.5): corpus-trained add-α
    * bigram log-probs, decimal-summed per document. */
  val lmDocScores: String =
    s"""WITH $lmScoreCtes
SELECT doc_id, n_bigrams, lm_score FROM sc ORDER BY doc_id"""

  /** Mirrors LanguageModel.scoreDocsAgainst with target = the
    * decontamination-convention benchmark subset (doc_id % 10 = 3):
    * model counts from the target only, LEFT joins with zero-coalesced
    * counts for out-of-target bigrams/contexts. */
  val lmCrossScores: String = raw"""WITH t AS (
  SELECT doc_id, $toks AS toks FROM documents),
tt AS (SELECT * FROM t WHERE doc_id % 10 = 3),
tbg AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
          unnest(toks[2:len(toks)]) AS w2 FROM tt WHERE len(toks) >= 2),
cbg AS (SELECT w1, w2, count(*) AS c FROM tbg GROUP BY 1, 2),
ctx AS (SELECT w1, count(*) AS n FROM tbg GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS vsz
      FROM (SELECT unnest(toks) AS tok FROM tt)),
bg AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2 FROM t WHERE len(toks) >= 2),
j AS (SELECT doc_id,
        CAST(round(ln((coalesce(c, 0) + 0.5) /
          (coalesce(n, 0) + 0.5 * vsz)), 6) AS DECIMAL(28,6)) AS lp
      FROM bg LEFT JOIN cbg USING (w1, w2) LEFT JOIN ctx USING (w1)
      CROSS JOIN v),
j2 AS (SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(lp) * 1000000 AS BIGINT) AS s FROM j GROUP BY doc_id)
SELECT doc_id, n_bigrams,
  (CASE WHEN s >= 0 THEN (2 * s + 100 * n_bigrams) // (200 * n_bigrams)
        ELSE -((2 * (-s) + 100 * n_bigrams) // (200 * n_bigrams)) END)
    / 10000.0 AS lm_score
FROM j2 ORDER BY doc_id"""

  /** Shared CTE chain replaying LanguageModel.scoreDocsKN (interpolated
    * Kneser–Ney trigram, D = 0.75): type counts over the distinct-
    * trigram relation, probability expressions term-for-term in the
    * engine's shapes, same 6-dp → DECIMAL → 4-dp micro-round tail;
    * ends with `knsc(doc_id, n_trigrams, kn_score)`. */
  private val knScoreCtes: String = raw"""t AS (
  SELECT doc_id, $toks AS toks FROM documents),
tg AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
         unnest(toks[2:len(toks)-1]) AS w2,
         unnest(toks[3:len(toks)]) AS w3 FROM t WHERE len(toks) >= 3),
t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
top AS (SELECT w1, w2, sum(c3) AS c2, count(*) AS n3 FROM t3 GROUP BY 1, 2),
mid AS (SELECT w2, w3, count(*) AS n1mid FROM t3 GROUP BY 1, 2),
midctx AS (SELECT w2, sum(n1mid) AS nmidtot, count(*) AS n2
           FROM mid GROUP BY 1),
low AS (SELECT w3, count(*) AS n1low FROM mid GROUP BY 1),
tot AS (SELECT count(*) AS ntypes FROM mid),
j AS (SELECT tg.doc_id,
        CAST(round(ln(
          greatest(c3 - 0.75, 0) / c2 +
          (0.75 * n3 / c2) * (
            greatest(n1mid - 0.75, 0) / nmidtot +
            (0.75 * n2 / nmidtot) *
              (CAST(n1low AS DOUBLE) / ntypes))), 6)
          AS DECIMAL(28,6)) AS lp
      FROM tg JOIN t3 USING (w1, w2, w3) JOIN top USING (w1, w2)
        JOIN mid USING (w2, w3) JOIN midctx USING (w2)
        JOIN low USING (w3) CROSS JOIN tot),
j2 AS (SELECT doc_id, count(*) AS n_trigrams,
         CAST(sum(lp) * 1000000 AS BIGINT) AS s FROM j GROUP BY doc_id),
knsc AS (SELECT doc_id, n_trigrams,
  (CASE WHEN s >= 0 THEN (2 * s + 100 * n_trigrams) // (200 * n_trigrams)
        ELSE -((2 * (-s) + 100 * n_trigrams) // (200 * n_trigrams)) END)
    / 10000.0 AS kn_score
FROM j2)"""

  /** Mirrors `lm_kn_scores`. */
  val lmKnScores: String = s"""WITH $knScoreCtes
SELECT doc_id, n_trigrams, kn_score FROM knsc ORDER BY doc_id"""

  /** Shared CTEs replaying `LanguageModel.scoreDocsKNMod`: the
    * [[knScoreCtes]] relations widened with follower counts BY COUNT
    * CLASS, the two count-of-counts rows, and the Chen–Goodman
    * modified discounts D_k = k − (k+1)·Y·n_{k+1}/n_k (clamped at 0;
    * empty class → 0.75) — expression-for-expression the engine's
    * arithmetic. Ends in `knmsc(doc_id, n_trigrams, kn_score)` and
    * exposes `dt`/`dm` (the discount rows). */
  private val knModCtes: String = raw"""t AS (
  SELECT doc_id, $toks AS toks FROM documents),
tg AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
         unnest(toks[2:len(toks)-1]) AS w2,
         unnest(toks[3:len(toks)]) AS w3 FROM t WHERE len(toks) >= 3),
t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
top AS (SELECT w1, w2, sum(c3) AS c2,
          sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS f1,
          sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS f2,
          sum(CASE WHEN c3 >= 3 THEN 1 ELSE 0 END) AS f3p
        FROM t3 GROUP BY 1, 2),
mid AS (SELECT w2, w3, count(*) AS n1mid FROM t3 GROUP BY 1, 2),
midctx AS (SELECT w2, sum(n1mid) AS nmidtot,
             sum(CASE WHEN n1mid = 1 THEN 1 ELSE 0 END) AS g1,
             sum(CASE WHEN n1mid = 2 THEN 1 ELSE 0 END) AS g2,
             sum(CASE WHEN n1mid >= 3 THEN 1 ELSE 0 END) AS g3p
           FROM mid GROUP BY 1),
low AS (SELECT w3, count(*) AS n1low FROM mid GROUP BY 1),
tot AS (SELECT count(*) AS ntypes FROM mid),
coct AS (SELECT sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS kn1,
                sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS kn2,
                sum(CASE WHEN c3 = 3 THEN 1 ELSE 0 END) AS kn3,
                sum(CASE WHEN c3 = 4 THEN 1 ELSE 0 END) AS kn4 FROM t3),
cocm AS (SELECT sum(CASE WHEN n1mid = 1 THEN 1 ELSE 0 END) AS kn1,
                sum(CASE WHEN n1mid = 2 THEN 1 ELSE 0 END) AS kn2,
                sum(CASE WHEN n1mid = 3 THEN 1 ELSE 0 END) AS kn3,
                sum(CASE WHEN n1mid = 4 THEN 1 ELSE 0 END) AS kn4 FROM mid),
dt AS (SELECT
  CASE WHEN kn1 > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) * (CASE WHEN kn1 + 2 * kn2 > 0
      THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)
      * (CAST(kn2 AS DOUBLE) / kn1)) ELSE 0.75 END AS dt1,
  CASE WHEN kn2 > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST(2 AS DOUBLE) - CAST(3 AS DOUBLE) * (CASE WHEN kn1 + 2 * kn2 > 0
      THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)
      * (CAST(kn3 AS DOUBLE) / kn2)) ELSE 0.75 END AS dt2,
  CASE WHEN kn3 > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST(3 AS DOUBLE) - CAST(4 AS DOUBLE) * (CASE WHEN kn1 + 2 * kn2 > 0
      THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)
      * (CAST(kn4 AS DOUBLE) / kn3)) ELSE 0.75 END AS dt3
  FROM coct),
dm AS (SELECT
  CASE WHEN kn1 > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) * (CASE WHEN kn1 + 2 * kn2 > 0
      THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)
      * (CAST(kn2 AS DOUBLE) / kn1)) ELSE 0.75 END AS dm1,
  CASE WHEN kn2 > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST(2 AS DOUBLE) - CAST(3 AS DOUBLE) * (CASE WHEN kn1 + 2 * kn2 > 0
      THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)
      * (CAST(kn3 AS DOUBLE) / kn2)) ELSE 0.75 END AS dm2,
  CASE WHEN kn3 > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST(3 AS DOUBLE) - CAST(4 AS DOUBLE) * (CASE WHEN kn1 + 2 * kn2 > 0
      THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)
      * (CAST(kn4 AS DOUBLE) / kn3)) ELSE 0.75 END AS dm3
  FROM cocm),
jm AS (SELECT tg.doc_id,
        CAST(round(ln(
          greatest(c3 - (CASE WHEN c3 = 1 THEN dt1
                              WHEN c3 = 2 THEN dt2 ELSE dt3 END),
                   CAST(0 AS DOUBLE)) / c2 +
          ((dt1 * f1 + dt2 * f2 + dt3 * f3p) / c2) * (
            greatest(n1mid - (CASE WHEN n1mid = 1 THEN dm1
                                   WHEN n1mid = 2 THEN dm2 ELSE dm3 END),
                     CAST(0 AS DOUBLE)) / nmidtot +
            ((dm1 * g1 + dm2 * g2 + dm3 * g3p) / nmidtot) *
              (CAST(n1low AS DOUBLE) / ntypes))), 6)
          AS DECIMAL(28,6)) AS lp
      FROM tg JOIN t3 USING (w1, w2, w3) JOIN top USING (w1, w2)
        JOIN mid USING (w2, w3) JOIN midctx USING (w2)
        JOIN low USING (w3) CROSS JOIN tot CROSS JOIN dt CROSS JOIN dm),
jm2 AS (SELECT doc_id, count(*) AS n_trigrams,
         CAST(sum(lp) * 1000000 AS BIGINT) AS s FROM jm GROUP BY doc_id),
knmsc AS (SELECT doc_id, n_trigrams,
  (CASE WHEN s >= 0 THEN (2 * s + 100 * n_trigrams) // (200 * n_trigrams)
        ELSE -((2 * (-s) + 100 * n_trigrams) // (200 * n_trigrams)) END)
    / 10000.0 AS kn_score
FROM jm2)"""

  /** Mirrors `lm_kn_mod_scores`. */
  val lmKnModScores: String = s"""WITH $knModCtes
SELECT doc_id, n_trigrams, kn_score FROM knmsc ORDER BY doc_id"""

  /** Mirrors `lm_kn_mod_discounts`: the derived discount row itself. */
  val lmKnModDiscounts: String = s"""WITH $knModCtes
SELECT dt1 AS d1t, dt2 AS d2t, dt3 AS d3t, dm1 AS d1m, dm2 AS d2m,
  dm3 AS d3m
FROM dt CROSS JOIN dm"""

  /** One (D₁,D₂,D₃₊) Chen–Goodman discount triple as SELECT columns
    * over a count-of-counts row (kn1..kn4 in scope) — the same CASE
    * shapes as the trigram `dt`/`dm` blocks, shared by every order of
    * the 5-gram chain. */
  private def cgDiscounts(p: String): String = {
    val y = s"(CASE WHEN kn1 + 2 * kn2 > 0 THEN CAST(kn1 AS DOUBLE) / (kn1 + 2 * kn2) ELSE CAST(0 AS DOUBLE) END)"
    def dk(k: Int, nk: String, nk1: String): String =
      s"""CASE WHEN $nk > 0 THEN greatest(CAST(0 AS DOUBLE),
    CAST($k AS DOUBLE) - CAST(${k + 1} AS DOUBLE) * $y
      * (CAST($nk1 AS DOUBLE) / $nk)) ELSE 0.75 END"""
    s"""${dk(1, "kn1", "kn2")} AS ${p}1,
  ${dk(2, "kn2", "kn3")} AS ${p}2,
  ${dk(3, "kn3", "kn4")} AS ${p}3"""
  }

  /** Count-of-counts (kn1..kn4) of column `cnt` in relation `rel`. */
  private def cocSql(rel: String, cnt: String): String =
    s"""SELECT sum(CASE WHEN $cnt = 1 THEN 1 ELSE 0 END) AS kn1,
       sum(CASE WHEN $cnt = 2 THEN 1 ELSE 0 END) AS kn2,
       sum(CASE WHEN $cnt = 3 THEN 1 ELSE 0 END) AS kn3,
       sum(CASE WHEN $cnt = 4 THEN 1 ELSE 0 END) AS kn4 FROM $rel"""

  /** By-count-class follower columns of `cnt` (cls1/cls2/cls3p). */
  private def clsSql(cnt: String, p: String): String =
    s"""sum(CASE WHEN $cnt = 1 THEN 1 ELSE 0 END) AS ${p}1,
       sum(CASE WHEN $cnt = 2 THEN 1 ELSE 0 END) AS ${p}2,
       sum(CASE WHEN $cnt >= 3 THEN 1 ELSE 0 END) AS ${p}3p"""

  /** Shared CTEs replaying `LanguageModel.scoreDocsKNMod5` — the
    * modified-KN recursion unrolled over orders 5→4→3→2→1: each
    * level's relation is the type-count aggregation of the level
    * above, orders 5..2 carry count-of-counts-derived discounts and a
    * by-count-class γ, base case the order-1 continuation
    * distribution; probability arithmetic nested in exactly the
    * engine's expression shapes, same 6-dp/DECIMAL/4-dp tail. Ends in
    * `kn5sc(doc_id, n_5grams, kn_score)`; exposes du/dv/dx/dz (the
    * order-5..2 discount rows). */
  private val kn5Ctes: String = {
    def dOf(c: String, p: String): String =
      s"(CASE WHEN $c = 1 THEN ${p}1 WHEN $c = 2 THEN ${p}2 ELSE ${p}3 END)"
    def gamma(p: String, cls: String, tot: String): String =
      s"((${p}1 * ${cls}1 + ${p}2 * ${cls}2 + ${p}3 * ${cls}3p) / $tot)"
    raw"""t AS (
  SELECT doc_id, $toks AS toks FROM documents),
gs AS MATERIALIZED (SELECT doc_id, unnest(toks[1:len(toks)-4]) AS w1,
         unnest(toks[2:len(toks)-3]) AS w2,
         unnest(toks[3:len(toks)-2]) AS w3,
         unnest(toks[4:len(toks)-1]) AS w4,
         unnest(toks[5:len(toks)]) AS w5 FROM t WHERE len(toks) >= 5),
g5 AS MATERIALIZED (SELECT w1, w2, w3, w4, w5, count(*) AS c5 FROM gs
       GROUP BY 1, 2, 3, 4, 5),
ctx5 AS (SELECT w1, w2, w3, w4, sum(c5) AS tot5, ${clsSql("c5", "a")}
         FROM g5 GROUP BY 1, 2, 3, 4),
m4 AS MATERIALIZED (SELECT w2, w3, w4, w5, count(*) AS k4 FROM g5 GROUP BY 1, 2, 3, 4),
ctx4 AS (SELECT w2, w3, w4, sum(k4) AS tot4, ${clsSql("k4", "b")}
         FROM m4 GROUP BY 1, 2, 3),
m3 AS MATERIALIZED (SELECT w3, w4, w5, count(*) AS k3 FROM m4 GROUP BY 1, 2, 3),
ctx3 AS (SELECT w3, w4, sum(k3) AS tot3, ${clsSql("k3", "e")}
         FROM m3 GROUP BY 1, 2),
m2 AS MATERIALIZED (SELECT w4, w5, count(*) AS k2 FROM m3 GROUP BY 1, 2),
ctx2 AS (SELECT w4, sum(k2) AS tot2, ${clsSql("k2", "g")}
         FROM m2 GROUP BY 1),
m1 AS (SELECT w5, count(*) AS k1 FROM m2 GROUP BY 1),
tot1 AS (SELECT count(*) AS ntypes FROM m2),
coc5 AS (${cocSql("g5", "c5")}),
coc4 AS (${cocSql("m4", "k4")}),
coc3 AS (${cocSql("m3", "k3")}),
coc2 AS (${cocSql("m2", "k2")}),
du AS (SELECT ${cgDiscounts("u")} FROM coc5),
dv AS (SELECT ${cgDiscounts("v")} FROM coc4),
dx AS (SELECT ${cgDiscounts("x")} FROM coc3),
dz AS (SELECT ${cgDiscounts("z")} FROM coc2),
j5 AS (SELECT gs.doc_id,
        CAST(round(ln(
          greatest(c5 - ${dOf("c5", "u")}, CAST(0 AS DOUBLE)) / tot5 +
          ${gamma("u", "a", "tot5")} * (
          greatest(k4 - ${dOf("k4", "v")}, CAST(0 AS DOUBLE)) / tot4 +
          ${gamma("v", "b", "tot4")} * (
          greatest(k3 - ${dOf("k3", "x")}, CAST(0 AS DOUBLE)) / tot3 +
          ${gamma("x", "e", "tot3")} * (
          greatest(k2 - ${dOf("k2", "z")}, CAST(0 AS DOUBLE)) / tot2 +
          ${gamma("z", "g", "tot2")} *
            (CAST(k1 AS DOUBLE) / ntypes))))), 6)
          AS DECIMAL(28,6)) AS lp
      FROM gs JOIN g5 USING (w1, w2, w3, w4, w5)
        JOIN ctx5 USING (w1, w2, w3, w4)
        JOIN m4 USING (w2, w3, w4, w5) JOIN ctx4 USING (w2, w3, w4)
        JOIN m3 USING (w3, w4, w5) JOIN ctx3 USING (w3, w4)
        JOIN m2 USING (w4, w5) JOIN ctx2 USING (w4)
        JOIN m1 USING (w5) CROSS JOIN tot1
        CROSS JOIN du CROSS JOIN dv CROSS JOIN dx CROSS JOIN dz),
j52 AS (SELECT doc_id, count(*) AS n_5grams,
         CAST(sum(lp) * 1000000 AS BIGINT) AS s FROM j5 GROUP BY doc_id),
kn5sc AS (SELECT doc_id, n_5grams,
  (CASE WHEN s >= 0 THEN (2 * s + 100 * n_5grams) // (200 * n_5grams)
        ELSE -((2 * (-s) + 100 * n_5grams) // (200 * n_5grams)) END)
    / 10000.0 AS kn_score
FROM j52)"""
  }

  /** Mirrors `lm_kn5_scores`. */
  val lmKn5Scores: String = s"""WITH $kn5Ctes
SELECT doc_id, n_5grams, kn_score FROM kn5sc ORDER BY doc_id"""

  /** Mirrors `lm_kn5_discounts`: the four per-order discount rows. */
  val lmKn5Discounts: String = s"""WITH $kn5Ctes
SELECT u1 AS d1_o5, u2 AS d2_o5, u3 AS d3_o5,
  v1 AS d1_o4, v2 AS d2_o4, v3 AS d3_o4,
  x1 AS d1_o3, x2 AS d2_o3, x3 AS d3_o3,
  z1 AS d1_o2, z2 AS d2_o2, z3 AS d3_o2
FROM du CROSS JOIN dv CROSS JOIN dx CROSS JOIN dz"""

  /** Mirrors `c4_line_filter`: the multi-line demo synthesis (8-word
    * lines with planted suffixes and page markers) and every C4 rule —
    * terminal punctuation, min line words, javascript lines,
    * lorem-ipsum/brace/min-sentences page gates — replayed with list
    * ops (order-preserving, no unnest). */
  /** The multi-line demo synthesis (SparkEntry.multilineDocs replayed):
    * 8-word lines with planted punctuation/javascript suffixes and
    * lorem/brace page markers — shared by the C4 and boilerplate-line
    * oracles. Ends with `mt(doc_id, mtext)`. */
  private val multilineCtes: String = raw"""t AS (
  SELECT doc_id, $toks AS toks FROM documents),
ln AS (SELECT doc_id, toks,
         greatest(1, (len(toks) + 7) // 8) AS nl FROM t),
mt AS (
  SELECT doc_id,
    array_to_string(
      [array_to_string(toks[i*8+1 : i*8+8], ' ') ||
       CASE WHEN (doc_id + i) % 17 = 0 THEN ' javascript.'
            WHEN (doc_id + i) % 3 = 0 THEN '.'
            ELSE '' END
       for i in range(0, nl)], chr(10)) ||
    CASE WHEN doc_id % 41 = 7 THEN chr(10) || 'lorem ipsum dolor sit.'
         ELSE '' END ||
    CASE WHEN doc_id % 43 = 11 THEN chr(10) || 'brace { code line.'
         ELSE '' END AS mtext
  FROM ln)"""

  val c4LineFilter: String = s"""WITH $multilineCtes,
""" + raw"""res AS (
  SELECT doc_id, mtext,
    string_split(mtext, chr(10)) AS alllines,
    list_filter(string_split(mtext, chr(10)), l ->
      regexp_matches(trim(l), '[.!?"]$$')
      AND len(list_filter(string_split_regex(trim(l), '\s+'),
        x -> x <> '')) >= 3
      AND NOT contains(lower(trim(l)), 'javascript')) AS keptl
  FROM mt),
res2 AS (
  SELECT doc_id, mtext, alllines, keptl,
    -- DuckDB's array_to_string of an EMPTY list is NULL; Spark's
    -- array_join is '' — coalesce to the Spark semantics
    coalesce(array_to_string(keptl, chr(10)), '') AS cl
  FROM res),
res3 AS (
  SELECT doc_id, md5(cl) AS clean_md5,
    CAST(len(alllines) AS BIGINT) AS n_lines,
    CAST(len(keptl) AS BIGINT) AS n_kept_lines,
    CAST(length(cl) - length(regexp_replace(cl, '[.!?]', '', 'g'))
      AS BIGINT) AS n_sentences,
    mtext
  FROM res2)
SELECT doc_id, clean_md5, n_lines, n_kept_lines, n_sentences,
  (n_sentences >= 5 AND NOT contains(lower(mtext), 'lorem ipsum')
    AND NOT contains(mtext, '{')) AS kept
FROM res3 ORDER BY doc_id"""

  /** Mirrors `dedup_corpus_lines`: the multiline base plus planted
    * boilerplate footers, then corpus-level duplicate-line removal —
    * lines in ≥ 5 distinct docs excised everywhere, order-preserving
    * rebuild via list_filter against the collected boilerplate list. */
  val dedupCorpusLines: String = s"""WITH $multilineCtes,
mt2 AS (
  SELECT doc_id, mtext ||
    CASE WHEN doc_id % 2 = 0
         THEN chr(10) || 'contact us at example dot com.' ELSE '' END ||
    CASE WHEN doc_id % 29 = 3
         THEN chr(10) || 'special offer ends soon.' ELSE '' END ||
    CASE WHEN doc_id % 101 = 5
         THEN chr(10) || 'exactly at the threshold line.' ELSE '' END ||
    CASE WHEN doc_id % 251 = 7
         THEN chr(10) || 'rare enough to survive here.' ELSE '' END
    AS mtext
  FROM mt),
l0 AS (SELECT doc_id, unnest(string_split(mtext, chr(10))) AS line FROM mt2),
bl AS (SELECT line FROM (
         SELECT line, count(DISTINCT doc_id) AS df FROM l0 GROUP BY line)
       WHERE df >= 5),
bll AS (SELECT coalesce(list(line), []) AS bl_list FROM bl),
res AS (SELECT doc_id, string_split(mtext, chr(10)) AS ls FROM mt2),
out AS (SELECT doc_id,
    list_filter(ls, l -> NOT list_contains(bl_list, l)) AS keptl,
    len(ls) AS n_lines
  FROM res CROSS JOIN bll)
SELECT doc_id,
  md5(coalesce(array_to_string(keptl, chr(10)), '')) AS clean_md5,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(len(keptl) AS BIGINT) AS n_kept_lines
FROM out ORDER BY doc_id"""

  /** Mirrors `lm_kn_cross_scores`: the KN model trained on the
    * benchmark-subset target (doc_id % 10 = 3), the whole corpus scored
    * with backoff down the interpolation chain — CASE shapes mirror the
    * engine's when/otherwise expressions term-for-term (0.5 and the
    * weights cast to DOUBLE). */
  val lmKnCrossScores: String = {
    val plow = "coalesce(CAST(n1low AS DOUBLE), CAST(0.5 AS DOUBLE)) / ntypes"
    val pmid = s"""CASE WHEN nmidtot IS NULL THEN $plow
             ELSE greatest(coalesce(n1mid, 0) - 0.75, 0) / nmidtot
                  + (0.75 * n2 / nmidtot) * ($plow) END"""
    val ptop = s"""CASE WHEN c2 IS NULL THEN $pmid
             ELSE greatest(coalesce(c3, 0) - 0.75, 0) / c2
                  + (0.75 * n3 / c2) * ($pmid) END"""
    raw"""WITH t AS (
  SELECT doc_id, $toks AS toks FROM documents),
tt AS (SELECT * FROM t WHERE doc_id % 10 = 3),
ttg AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
          unnest(toks[2:len(toks)-1]) AS w2,
          unnest(toks[3:len(toks)]) AS w3 FROM tt WHERE len(toks) >= 3),
t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM ttg GROUP BY 1, 2, 3),
top AS (SELECT w1, w2, sum(c3) AS c2, count(*) AS n3 FROM t3 GROUP BY 1, 2),
mid AS (SELECT w2, w3, count(*) AS n1mid FROM t3 GROUP BY 1, 2),
midctx AS (SELECT w2, sum(n1mid) AS nmidtot, count(*) AS n2
           FROM mid GROUP BY 1),
low AS (SELECT w3, count(*) AS n1low FROM mid GROUP BY 1),
tot AS (SELECT count(*) AS ntypes FROM mid),
bg AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
         unnest(toks[2:len(toks)-1]) AS w2,
         unnest(toks[3:len(toks)]) AS w3 FROM t WHERE len(toks) >= 3),
j AS (SELECT bg.doc_id,
        CAST(round(ln($ptop), 6) AS DECIMAL(28,6)) AS lp
      FROM bg LEFT JOIN t3 USING (w1, w2, w3) LEFT JOIN top USING (w1, w2)
        LEFT JOIN mid USING (w2, w3) LEFT JOIN midctx USING (w2)
        LEFT JOIN low USING (w3) CROSS JOIN tot),
j2 AS (SELECT doc_id, count(*) AS n_trigrams,
         CAST(sum(lp) * 1000000 AS BIGINT) AS s FROM j GROUP BY doc_id)
SELECT doc_id, n_trigrams,
  (CASE WHEN s >= 0 THEN (2 * s + 100 * n_trigrams) // (200 * n_trigrams)
        ELSE -((2 * (-s) + 100 * n_trigrams) // (200 * n_trigrams)) END)
    / 10000.0 AS kn_score
FROM j2 ORDER BY doc_id"""
  }

  /** Mirrors `quality_perplexity_buckets_kn`: the CCNet triage rebased
    * on the KN trigram score — same exact micro-unit histogram /
    * tie-inclusive integer-threshold tail as [[lmPerplexityBuckets]]. */
  val lmKnPerplexityBuckets: String = s"""WITH $knScoreCtes,
g AS (SELECT doc_id, n_trigrams, kn_score,
        CAST(round(kn_score * 10000) AS BIGINT) AS m FROM knsc),
h AS (SELECT m, count(*) AS cnt FROM g GROUP BY m),
c AS (SELECT m, cnt,
        sum(cnt) OVER (ORDER BY m DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n
      FROM h),
thr AS (SELECT
    max(CASE WHEN cum >= (n * 300 + 999) // 1000 THEN m END) AS th,
    max(CASE WHEN cum >= (n * 700 + 999) // 1000 THEN m END) AS tm
  FROM c)
SELECT doc_id, n_trigrams, kn_score,
  CASE WHEN m >= th THEN 'head'
       WHEN m >= tm THEN 'middle'
       ELSE 'tail' END AS bucket
FROM g CROSS JOIN thr ORDER BY doc_id"""

  /** Mirrors LanguageModel.perplexityBuckets(300/400/300): exact
    * micro-unit histogram, descending cumulative counts, ⌈n·p/1000⌉
    * integer targets, tie-inclusive thresholds. */
  val lmPerplexityBuckets: String = s"""WITH $lmScoreCtes,
g AS (SELECT doc_id, n_bigrams, lm_score,
        CAST(round(lm_score * 10000) AS BIGINT) AS m FROM sc),
h AS (SELECT m, count(*) AS cnt FROM g GROUP BY m),
c AS (SELECT m, cnt,
        sum(cnt) OVER (ORDER BY m DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n
      FROM h),
thr AS (SELECT
    max(CASE WHEN cum >= (n * 300 + 999) // 1000 THEN m END) AS th,
    max(CASE WHEN cum >= (n * 700 + 999) // 1000 THEN m END) AS tm
  FROM c)
SELECT doc_id, n_bigrams, lm_score,
  CASE WHEN m >= th THEN 'head'
       WHEN m >= tm THEN 'middle'
       ELSE 'tail' END AS bucket
FROM g CROSS JOIN thr ORDER BY doc_id"""

  /** Mirrors Chunking.chunk(size=64, overlap=16 → step 48): windows via
    * unnest(range(0, ceil(n/step))) and 1-based inclusive list slices. */
  val chunkDocuments: String = raw"""WITH t AS (
  SELECT doc_id, $toks AS toks FROM documents),
c AS (SELECT doc_id, toks,
        unnest(range(0, (len(toks) + 47) // 48)) AS chunk_idx
      FROM t WHERE len(toks) > 0)
SELECT doc_id, chunk_idx,
  len(toks[chunk_idx*48+1 : chunk_idx*48+64]) AS n_tokens,
  md5(array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64], ' ')) AS chunk_md5
FROM c ORDER BY doc_id, chunk_idx"""

  /** Mirrors SequencePacking.pack (budget 512, shard = lang): exclusive
    * per-shard prefix sum of whitespace token counts in doc_id order, cut
    * into fixed 512-token sequences. */
  private val packCte = raw"""t AS (SELECT doc_id, lang AS shard,
       CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
p AS (SELECT doc_id, shard, n_tokens,
        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_tok
      FROM t),
packed AS (SELECT doc_id, shard, n_tokens,
             CAST(start_tok // 512 AS BIGINT) AS seq_id,
             CAST(start_tok % 512 AS BIGINT) AS seq_offset,
             start_tok % 512 + n_tokens > 512 AS spans_boundary
           FROM p)"""

  val packSequences: String = s"""WITH $packCte
SELECT doc_id, shard, n_tokens, seq_id, seq_offset, spans_boundary
FROM packed ORDER BY doc_id"""

  /** The packSplit fragment relation (budget 512, shard = lang): the
    * same per-shard prefix sum as [[packCte]], then one row per
    * (doc, sequence) fragment via generate_series over the crossed
    * sequence ids; offsets/lengths are the window-intersection
    * arithmetic. */
  private val fragCtes = s"""$packCte,
f AS (SELECT doc_id, shard, n_tokens, start_tok,
        CAST((start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
          AS BIGINT) AS n_frags,
        unnest(generate_series(start_tok // 512,
          (start_tok + n_tokens - 1) // 512)) AS seq_id
      FROM p WHERE n_tokens > 0),
fr AS (SELECT doc_id, shard, n_tokens, CAST(seq_id AS BIGINT) AS seq_id,
  CAST(greatest(start_tok, seq_id * 512) - seq_id * 512 AS BIGINT)
    AS seq_offset,
  CAST(greatest(start_tok, seq_id * 512) - start_tok AS BIGINT)
    AS doc_offset,
  CAST(least(start_tok + n_tokens, (seq_id + 1) * 512)
    - greatest(start_tok, seq_id * 512) AS BIGINT) AS frag_len,
  n_frags
FROM f)"""

  /** Mirrors `SequencePacking.packSplit` (budget 512, shard = lang). */
  val packFragments: String = s"""WITH $fragCtes
SELECT doc_id, shard, n_tokens, seq_id, seq_offset, doc_offset,
  frag_len, n_frags
FROM fr ORDER BY doc_id, seq_id"""

  /** Mirrors `SequencePacking.sequenceManifest` over the packSplit
    * fragments: the `;`-joined `doc_id:doc_offset:frag_len` recipe in
    * in-sequence order plus the per-sequence roll-ups. */
  val packManifest: String = s"""WITH $fragCtes
SELECT shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(frag_len) AS BIGINT) AS n_tokens,
  string_agg(CAST(doc_id AS VARCHAR) || ':' ||
    CAST(doc_offset AS VARCHAR) || ':' || CAST(frag_len AS VARCHAR),
    ';' ORDER BY seq_offset) AS manifest
FROM fr GROUP BY shard, seq_id ORDER BY shard, seq_id"""

  /** Mirrors `SequencePacking.packShuffled` (budget 512, shard = lang,
    * epoch 1): the shared md5-prefix order key over '1:' ‖ doc_id, the
    * per-shard prefix sum in (ord, doc_id) order, same budget cuts. */
  val packSequencesEpoch: String = raw"""WITH t AS (
  SELECT doc_id, lang AS shard, CAST(len($toks) AS BIGINT) AS n_tokens,
    CAST(('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 15))
      AS BIGINT) AS ord
  FROM documents),
p AS (SELECT doc_id, shard, n_tokens, ord,
        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
          ORDER BY ord, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_tok
      FROM t)
SELECT doc_id, shard, n_tokens, ord,
  CAST(start_tok // 512 AS BIGINT) AS seq_id,
  CAST(start_tok % 512 AS BIGINT) AS seq_offset,
  start_tok % 512 + n_tokens > 512 AS spans_boundary
FROM p ORDER BY doc_id"""

  /** Mirrors `SequencePacking.packSplitShuffled` (budget 512, shard =
    * lang, epoch 1): the epoch order key, the per-shard prefix in
    * (ord, doc_id) order, then the packSplit fragment arithmetic. */
  val packFragmentsEpoch: String = raw"""WITH te AS (
  SELECT doc_id, lang AS shard, CAST(len($toks) AS BIGINT) AS n_tokens,
    CAST(('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 15))
      AS BIGINT) AS ord
  FROM documents),
pe AS (SELECT doc_id, shard, n_tokens, ord,
        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
          ORDER BY ord, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_tok
      FROM te),
fe AS (SELECT doc_id, shard, n_tokens, ord, start_tok,
        CAST((start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
          AS BIGINT) AS n_frags,
        unnest(generate_series(start_tok // 512,
          (start_tok + n_tokens - 1) // 512)) AS seq_id
      FROM pe WHERE n_tokens > 0)
SELECT doc_id, shard, n_tokens, ord, CAST(seq_id AS BIGINT) AS seq_id,
  CAST(greatest(start_tok, seq_id * 512) - seq_id * 512 AS BIGINT)
    AS seq_offset,
  CAST(greatest(start_tok, seq_id * 512) - start_tok AS BIGINT)
    AS doc_offset,
  CAST(least(start_tok + n_tokens, (seq_id + 1) * 512)
    - greatest(start_tok, seq_id * 512) AS BIGINT) AS frag_len,
  n_frags
FROM fe ORDER BY doc_id, seq_id"""

  val packSequenceStats: String = s"""WITH $packCte
SELECT shard, seq_id, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  max(spans_boundary) AS has_overflow
FROM packed GROUP BY shard, seq_id ORDER BY shard, seq_id"""

  /** Mirrors SequencePacking.shardByTokenBudget(budget 5000): the engine's
    * two-phase bucketed prefix sum is exactly the naive global window
    * (integer decomposition), so the oracle IS the single window. */
  val shardTokenBudget: String = raw"""WITH t AS (
  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
p AS (SELECT doc_id, n_tokens,
        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_tok
      FROM t)
SELECT doc_id, n_tokens, start_tok,
  CAST(start_tok // 5000 AS BIGINT) AS shard
FROM p ORDER BY doc_id"""

  /** Mirrors the multimodal_audio_stats chain: Wav.syntheticWav's sample
    * arithmetic recomputed over the text bytes, then the decoder's
    * statistics with the SAME left-to-right float fold (list_reduce's
    * first-element seed equals a 0.0-seeded fold exactly, so the doubles
    * are bit-identical and the integer micro-unit floor is tie-free).
    * Length semantics are BYTES (strlen = UTF-8 octet count, matching
    * syntheticWav's getBytes), and null/empty text takes the same
    * (id·31+i) % 251 fallback as the encoder — so the oracle no longer
    * diverges on empty documents. Residual precondition (documented, not
    * hit by the test corpus): non-empty text must be ASCII, since ord()
    * reads a codepoint where the encoder reads a byte. */
  val multimodalAudioStats: String = """WITH s AS (
  SELECT doc_id, CAST(doc_id AS BIGINT) AS id, text,
         CAST(strlen(coalesce(text, '')) AS BIGINT) AS tlen,
         greatest(8, least(4096, strlen(coalesce(text, '')))) AS n
  FROM documents),
smp AS (
  SELECT doc_id, n,
    list_transform(range(0, n), i ->
      CASE WHEN (id + i) % 97 = 0 THEN 32767
           WHEN tlen = 0 THEN (CAST((id * 31 + i) % 251 AS INT) - 128) * 250
                + CAST((id + i) % 17 AS INT)
           ELSE (ord(substr(text, CAST(i % tlen AS INT) + 1, 1)) - 128) * 250
                + CAST((id + i) % 17 AS INT)
      END) AS samples
  FROM s),
st AS (
  SELECT doc_id, n,
    CAST(n AS DOUBLE) / 8.0 AS duration_ms,
    sqrt(list_reduce(list_transform(samples,
      x -> (x / 32768.0) * (x / 32768.0)), (a, b) -> a + b) / n) AS rms,
    list_reduce(list_transform(samples, x -> abs(x / 32768.0)),
      (a, b) -> greatest(a, b)) AS peak,
    len(list_filter(samples, x -> x = 32767 OR x = -32768)) AS n_clipped
  FROM smp)
SELECT doc_id, CAST(n AS BIGINT) AS n_frames, duration_ms,
  CAST(floor(rms * 1000000 + 0.5) AS BIGINT) AS rms_e6,
  CAST(floor(peak * 1000000 + 0.5) AS BIGINT) AS peak_e6,
  CAST(n_clipped AS BIGINT) AS n_clipped
FROM st ORDER BY doc_id"""

  /** Mirrors the multimodal_decode_stats chain: syntheticBmp/syntheticPng
    * pixels are the text bytes (id-padded), so the oracle recomputes the
    * per-pixel means in each codec's DECODE ORDER — BMP file order is
    * image rows bottom-up, PNG is top-down — and folds them with the
    * same left-to-right float sum (bit-identical doubles, tie-free
    * micro-unit floor). Verifies the real decoders' output values. */
  val multimodalDecodeStats: String = {
    def byteAt(i: String): String =
      s"CASE WHEN $i < len THEN ord(substr(text, CAST($i + 1 AS INT), 1)) ELSE CAST((id + $i) % 251 AS INT) END"
    s"""WITH s AS (
  SELECT doc_id, CAST(doc_id AS BIGINT) AS id, text,
         CAST(length(text) AS BIGINT) AS len,
         greatest(1, least(64, (length(text) + 47) // 48)) AS h
  FROM documents),
v AS (
  SELECT doc_id, h,
    list_transform(
      list_transform(range(0, 16 * h), k ->
        CASE WHEN id % 2 = 0
             THEN (h - 1 - k // 16) * 48 + (k % 16) * 3
             ELSE k * 3 END),
      base -> (${byteAt("base")} + ${byteAt("base + 1")} +
               ${byteAt("base + 2")}) / 3.0) AS pv
  FROM s),
st AS (
  SELECT doc_id, h,
    list_reduce(pv, (a, b) -> a + b) / (16 * h) / 255.0 AS brightness
  FROM v)
SELECT doc_id, 16 AS width, CAST(h AS INT) AS height, 3 AS channels,
  CAST(floor(brightness * 1000000 + 0.5) AS BIGINT) AS brightness_e6
FROM st ORDER BY doc_id"""
  }

  /** Mirrors Tokenizer.tokenize: recursive greedy longest-match over the
    * SAME literal vocab (the CTE is emitted by Tokenizer.oracleSegCtes
    * from the one Vocab definition). */
  val tokenizeDocuments: String = s"""WITH RECURSIVE
${Tokenizer.oracleSegCtes(Tokenizer.DemoVocab)}
SELECT doc_id,
  row_number() OVER (PARTITION BY doc_id ORDER BY wpos, ord) AS tpos, piece
FROM seg WHERE piece IS NOT NULL
ORDER BY doc_id, tpos"""

  /** Mirrors TextAnalysis-style tokenizer FERTILITY by language (pieces
    * per word — the multilingual tokenizer-bias metric): pre-token word
    * counts and wordpiece piece counts summed per lang, ratio rounded
    * half-up at 4 dp in pure integer arithmetic. */
  val tokenizerFertility: String = s"""WITH RECURSIVE
${Tokenizer.oracleSegCtes(Tokenizer.DemoVocab)},
pc AS (SELECT doc_id, count(*) AS p FROM seg
       WHERE piece IS NOT NULL GROUP BY doc_id),
wcnt AS (SELECT doc_id, lang,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
         FROM documents)
SELECT lang, CAST(sum(w) AS BIGINT) AS n_words,
  CAST(sum(coalesce(p, 0)) AS BIGINT) AS n_pieces,
  ((2 * sum(coalesce(p, 0)) * 10000 + sum(w)) // (2 * sum(w))) / 10000.0
    AS fertility
FROM wcnt LEFT JOIN pc USING (doc_id)
GROUP BY lang ORDER BY lang"""

  /** Mirrors SequencePacking.packCounted with wordpiece token counts and
    * 16 hash shards (doc_id % 16) — the scale-correct shard choice the
    * lang-sharded demo deliberately contrasts with. */
  val packSequencesBpe: String = s"""WITH RECURSIVE
${Tokenizer.oracleSegCtes(Tokenizer.DemoVocab)},
cnt AS (SELECT d.doc_id, CAST(d.doc_id % 16 AS BIGINT) AS shard,
          CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens
        FROM documents d LEFT JOIN (
          SELECT doc_id, count(*) AS n FROM seg
          WHERE piece IS NOT NULL GROUP BY doc_id) c USING (doc_id)),
p AS (SELECT doc_id, shard, n_tokens,
        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_tok
      FROM cnt)
SELECT doc_id, shard, n_tokens,
  CAST(start_tok // 512 AS BIGINT) AS seq_id,
  CAST(start_tok % 512 AS BIGINT) AS seq_offset,
  start_tok % 512 + n_tokens > 512 AS spans_boundary
FROM p ORDER BY doc_id"""

  private[graft] val normCte = """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
n AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
      FROM e)"""

  private val dotAB =
    "list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]), (x,y) -> x + y)"

  val cosinePairs: String = s"""WITH $normCte
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round($dotAB / (a.nrm * b.nrm), 4) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round($dotAB / (a.nrm * b.nrm), 4) >= 0.45
ORDER BY id_a, id_b"""

  val annTopK: String = s"""WITH $normCte,
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round($dotAB / (a.nrm * b.nrm), 4) AS cosine
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount})
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors EmbeddingOps.lshCosinePairs: the hyperplane components are
    * the same deterministic md5-derived doubles (emitted via Java's
    * shortest-round-trip toString, which DuckDB's correctly-rounded
    * parser reads back to identical bits), bucket bits use the same
    * left-to-right dot fold, and the bucket-population cap and
    * candidates-first shape are reproduced in SQL. */
  def lshPairs(threshold: Double = 0.45, numPlanes: Int = 8,
      numTables: Int = 12, dim: Int = 64, maxBucket: Long = 10000L): String = {
    val perTable = (0 until numTables).map { t =>
      val planes = EmbeddingOps.hyperplanes(t, numPlanes, dim)
      val bits = (0 until numPlanes).map { p =>
        val plane = planes(p).map(_.toString).mkString("[", ",", "]")
        s"(CASE WHEN list_reduce(list_transform(list_zip(v, $plane), z -> z[1] * z[2]), (x,y) -> x + y) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bits AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH $normCte,
b AS (
$perTable),
keep AS (SELECT tbl, bucket FROM b GROUP BY tbl, bucket HAVING count(*) <= $maxBucket),
bc AS (SELECT b.vec_id, b.tbl, b.bucket FROM b JOIN keep USING (tbl, bucket)),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM bc x JOIN bc y USING (tbl, bucket) WHERE x.vec_id < y.vec_id)
SELECT id_a, id_b, round($dotAB / (a.nrm * b.nrm), 4) AS cosine
FROM cand JOIN n a ON cand.id_a = a.vec_id JOIN n b ON cand.id_b = b.vec_id
WHERE round($dotAB / (a.nrm * b.nrm), 4) >= $threshold
ORDER BY id_a, id_b"""
  }

  /** Mirrors EmbeddingOps.randomProjection(outDim=8): the same
    * md5-derived hyperplanes re-emitted as SQL literals (shortest
    * round-trip doubles), same left-fold dot, same √(3/outDim) Achlioptas scale. */
  def randomProjection(outDim: Int = 8, dim: Int = 64,
      table: Int = 0): String = {
    val planes = EmbeddingOps.hyperplanes(table, outDim, dim)
    val scale = math.sqrt(3.0 / outDim).toString
    val comps = planes.map { plane =>
      val lit = plane.map(_.toString).mkString("[", ",", "]")
      s"round(list_reduce(list_transform(list_zip(v, $lit), z -> z[1] * z[2]), (x,y) -> x + y) * $scale, 6)"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
p AS (SELECT vec_id, [$comps] AS proj FROM e)
SELECT vec_id, unnest(${(0 until outDim).mkString("[", ",", "]")}) AS dim,
  unnest(proj) AS value
FROM p ORDER BY vec_id, dim"""
  }

  /** Mirrors Stats.profile minus the HLL approx-distinct column: per
    * column of `documents`, exact count / non-null / min / max (cast to
    * varchar) / mean (numeric columns only). */
  val profileExact: String = {
    val numeric = Set("doc_id", "n_chars")
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    cols.map { c =>
      val mean = if (numeric(c)) s"round(avg($c), 4)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS "column", count(*) AS n_rows, count($c) AS n_non_null,
         |  CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value,
         |  $mean AS mean FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY \"column\""
  }

  private val dotNC =
    "list_reduce(list_transform(list_zip(n.v, c.cv), z -> z[1] * z[2]), (x,y) -> x + y)"

  /** Mirrors the cluster_embeddings query: nearest id<8 centroid by
    * cosine, ties to the smallest centroid id (same rule as
    * EmbeddingOps.ivfAssignment). */
  val clusterEmbeddings: String = s"""WITH $normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
a AS (SELECT n.vec_id, c.cid,
        row_number() OVER (PARTITION BY n.vec_id
          ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
      FROM n CROSS JOIN cents c)
SELECT vec_id, cid AS cluster FROM a WHERE rn = 1 ORDER BY vec_id"""

  /** Mirrors `sample_balanced_clusters`: the [[clusterEmbeddings]]
    * assignment downsampled to the SMALLEST cluster's size by md5-bucket
    * rank with vec_id ties — Sampling.balanced replayed exactly. */
  val balancedClusterSample: String = s"""WITH $normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
a AS (SELECT vec_id, cluster FROM (
        SELECT n.vec_id, c.cid AS cluster,
          row_number() OVER (PARTITION BY n.vec_id
            ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
        FROM n CROSS JOIN cents c) t WHERE rn = 1),
m AS (SELECT min(n) AS m FROM (SELECT count(*) AS n FROM a GROUP BY cluster) t),
rk AS (SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY cluster
           ORDER BY ${bucketSql("vec_id")}, vec_id) AS rn
       FROM a)
SELECT vec_id, cluster FROM rk, m WHERE rn <= m.m ORDER BY vec_id"""

  /** Mirrors `ann_index_staleness` — `StreamingAnnIndex.stalenessReport`
    * over the demo setup: training balance = the seed-centroid (id < 8)
    * assignment over ALL embeddings; current occupancy = the grown
    * index after epochs 0–1 only (vec_id % 3 < 2). Shares and drift are
    * 4-dp with a `+ 0.0` pin (negative drift rounding to zero must not
    * read −0.0 — the PCA-lambda discipline). */
  val annIndexStaleness: String = s"""WITH $normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
assign AS (SELECT vec_id, cluster FROM (
    SELECT n.vec_id, c.cid AS cluster,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
str AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_train
        FROM assign GROUP BY 1),
snow AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_now
         FROM assign WHERE vec_id % 3 < 2 GROUP BY 1),
stot AS (SELECT (SELECT CAST(sum(n_train) AS BIGINT) FROM str) AS t_train,
                (SELECT CAST(sum(n_now) AS BIGINT) FROM snow) AS t_now)
SELECT str.cluster, str.n_train,
  CAST(coalesce(snow.n_now, 0) AS BIGINT) AS n_now,
  round(CAST(str.n_train AS DOUBLE) / t_train, 4) + 0.0 AS share_train,
  round(CAST(coalesce(snow.n_now, 0) AS DOUBLE) / t_now, 4) + 0.0
    AS share_now,
  round(CAST(coalesce(snow.n_now, 0) AS DOUBLE) / t_now
        - CAST(str.n_train AS DOUBLE) / t_train, 4) + 0.0 AS drift
FROM str CROSS JOIN stot LEFT JOIN snow ON snow.cluster = str.cluster
ORDER BY str.cluster"""

  /** Mirrors EmbeddingOps.ivfTopK with nlist=8, nprobe=2, k=5: centroids
    * are vectors with id < 8; assignment/probing by cosine with ties to
    * the smallest centroid id; exact re-score inside probed cells. */
  val annIvfTopK: String = s"""WITH $normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
assign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster, v AS nv, nrm AS nn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid AS cluster, v AS qv, nrm AS qn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id < ${EmbeddingOps.DemoQueryCount}) t
  WHERE rn <= 2),
cand AS (
  SELECT query_id, neighbor_id,
         round(list_reduce(list_transform(list_zip(qv, nv), z -> z[1] * z[2]),
               (x,y) -> x + y) / (qn * nn), 4) AS cosine
  FROM probes JOIN assign USING (cluster)
  WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rank FROM cand) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors EmbeddingOps.ivfHardNegatives(k=5, nlist=8, nprobe=2):
    * the annIvfTopK probe chain with anchor/neighbor labels joined in
    * and the label-mismatch filter applied BEFORE the per-anchor rank
    * window (same-label and self pairs never rank). */
  val annHardNegatives: String = s"""WITH $normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
assign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster, v AS nv, nrm AS nn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid AS cluster, v AS qv, nrm AS qn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id < ${EmbeddingOps.DemoQueryCount}) t
  WHERE rn <= 2),
cand AS (
  SELECT query_id, la.label AS anchor_label, neighbor_id,
         lb.label AS neighbor_label,
         round(list_reduce(list_transform(list_zip(qv, nv), z -> z[1] * z[2]),
               (x,y) -> x + y) / (qn * nn), 4) AS cosine
  FROM probes JOIN assign USING (cluster)
  JOIN embeddings la ON la.vec_id = query_id
  JOIN embeddings lb ON lb.vec_id = neighbor_id
  WHERE la.label <> lb.label)
SELECT query_id, anchor_label, neighbor_id, neighbor_label, cosine, rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rank FROM cand) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  // ─────────────────── SemDeDup / int8 quantization ───────────────────

  private val dotXY =
    "list_reduce(list_transform(list_zip(x.v, y.v), z -> z[1] * z[2]), (p,q) -> p + q)"

  /** Shared SemDeDup CTE chain mirroring SemanticDedup.assigned:
    * centroids = vectors with id < 8 (same deterministic rule as
    * clusterEmbeddings), assignment by raw cosine with ties to the
    * smaller centroid id, centroid_cos rounded to 4; clusters over the
    * population cap dropped (a no-op at demo scale, mirrored for shape
    * honesty like lshPairs' bucket cap). */
  private def semdedupCtes(maxCluster: Long): String = s"""$normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
asg AS (
  SELECT vec_id, cid AS cluster, v, nrm, round(d / (nrm * cn), 4) AS ccos FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm, c.cn, $dotNC AS d,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
keep AS (SELECT cluster FROM asg GROUP BY cluster HAVING count(*) <= $maxCluster),
ca AS (SELECT asg.* FROM asg JOIN keep USING (cluster))"""

  /** Mirrors SemanticDedup.pairs: intra-cluster pairs at exact cosine ≥
    * threshold (the SemDeDup recall contract — cross-cluster pairs are
    * out of scope by design; cosinePairs is the exact baseline). */
  def semdedupPairs(threshold: Double = 0.45,
      maxCluster: Long = 100000L): String =
    s"""WITH ${semdedupCtes(maxCluster)}
SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b,
       round($dotXY / (x.nrm * y.nrm), 4) AS cosine
FROM ca x JOIN ca y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
WHERE round($dotXY / (x.nrm * y.nrm), 4) >= $threshold
ORDER BY id_a, id_b"""

  /** Mirrors SemanticDedup.keepers: removed iff some same-cluster
    * neighbour at cosine ≥ threshold has a strictly smaller
    * (centroid_cos, vec_id). */
  def semdedupKeepers(threshold: Double = 0.45,
      maxCluster: Long = 100000L): String =
    s"""WITH ${semdedupCtes(maxCluster)},
removed AS (
  SELECT DISTINCT x.vec_id FROM ca x JOIN ca y
    ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
  WHERE round($dotXY / (x.nrm * y.nrm), 4) >= $threshold
    AND (y.ccos < x.ccos OR (y.ccos = x.ccos AND y.vec_id < x.vec_id)))
SELECT a.vec_id, a.cluster, a.ccos AS centroid_cos,
       (r.vec_id IS NULL) AS is_kept
FROM asg a LEFT JOIN removed r ON a.vec_id = r.vec_id
ORDER BY a.vec_id"""

  /** SemDeDup keeper-id CTE chain over a MEMBER SUBSET of the
    * embeddings: expects a preceding CTE `semmem(vec_id)` naming the
    * member ids; centroids stay the full-corpus seeds (vec_id < 8 —
    * the bootstrap convention, matching `ivfCentroids` on the full
    * table), assignment is per-vector so restricting after assignment
    * equals restricting before; the cluster-population cap counts
    * MEMBERS only, mirroring `SemanticDedup.keepers` run on the
    * restricted frame. Yields a final relation `semkeep(vec_id)` of
    * surviving members. Aliases are `s`-prefixed to compose with other
    * chains (e.g. the corpus-pipeline oracle). */
  def semdedupKeeperIdCtes(threshold: Double = 0.45,
      maxCluster: Long = 100000L): String = s"""$normCte,
scents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
sasg AS (
  SELECT vec_id, cid AS cluster, v, nrm, round(d / (nrm * cn), 4) AS ccos FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm, c.cn, $dotNC AS d,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN scents c) t WHERE rn = 1),
masg AS (SELECT sasg.* FROM sasg JOIN semmem ON sasg.vec_id = semmem.vec_id),
skeep AS (SELECT cluster FROM masg GROUP BY cluster HAVING count(*) <= $maxCluster),
sca AS (SELECT masg.* FROM masg JOIN skeep USING (cluster)),
sremoved AS (
  SELECT DISTINCT x.vec_id FROM sca x JOIN sca y
    ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
  WHERE round($dotXY / (x.nrm * y.nrm), 4) >= $threshold
    AND (y.ccos < x.ccos OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))),
semkeep AS (SELECT vec_id FROM masg
            WHERE vec_id NOT IN (SELECT vec_id FROM sremoved))"""

  /** Shared semantic-decontamination CTE chain mirroring
    * SemanticDedup.semanticContaminationPairs over the demo split:
    * bench = vec_id % 10 = 3, train = the rest; centroids the
    * full-corpus vec_id < 8 seeds (the bootstrap convention, matching
    * ivfCentroids on the full table); the train side assigned to its 1
    * nearest cell (ties to the smaller cid), the bench side probing
    * its nprobe nearest; pairs at exact rounded cosine ≥ threshold.
    * Yields a final relation `scont(cluster, vec_id, bench_id,
    * cosine)`. */
  private def semanticContaminationCtes(threshold: Double,
      nprobe: Int, maxCell: Long): String = s"""$normCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
trainasg AS (SELECT vec_id, cid AS cluster, v, nrm FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id % 10 <> 3) t WHERE rn = 1),
keepc AS (SELECT cluster FROM trainasg
          GROUP BY cluster HAVING count(*) <= $maxCell),
tk AS (SELECT trainasg.* FROM trainasg JOIN keepc USING (cluster)),
benchprobe AS (SELECT vec_id AS bench_id, cid AS cluster, v, nrm FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id % 10 = 3) t WHERE rn <= $nprobe),
scont AS (SELECT x.cluster, x.vec_id, y.bench_id,
    round($dotXY / (x.nrm * y.nrm), 4) AS cosine
  FROM tk x JOIN benchprobe y ON x.cluster = y.cluster
  WHERE round($dotXY / (x.nrm * y.nrm), 4) >= $threshold)"""

  /** Mirrors decontaminate_semantic_pairs. */
  def semanticContaminationPairs(threshold: Double = 0.45,
      nprobe: Int = 2, maxCell: Long = 100000L): String =
    s"""WITH ${semanticContaminationCtes(threshold, nprobe, maxCell)}
SELECT cluster, vec_id, bench_id, cosine FROM scont
ORDER BY vec_id, bench_id"""

  /** Mirrors decontaminate_semantic_corpus: train ids that survive. */
  def semanticDecontaminatedCorpus(threshold: Double = 0.45,
      nprobe: Int = 2, maxCell: Long = 100000L): String =
    s"""WITH ${semanticContaminationCtes(threshold, nprobe, maxCell)}
SELECT vec_id FROM n WHERE vec_id % 10 <> 3
  AND vec_id NOT IN (SELECT DISTINCT vec_id FROM scont)
ORDER BY vec_id"""

  /** Mirrors decontaminate_semantic_report: per-eval-item leak
    * counts over the same CTEs. */
  def semanticContaminationReport(threshold: Double = 0.45,
      nprobe: Int = 2, maxCell: Long = 100000L): String =
    s"""WITH ${semanticContaminationCtes(threshold, nprobe, maxCell)}
SELECT bench_id, count(*) AS n_contaminated,
  max(cosine) AS max_cosine, min(vec_id) AS first_vec
FROM scont GROUP BY bench_id ORDER BY bench_id"""

  /** Mirrors DecontaminationEval.evalReport: replay the planted-leak
    * construction (leak = (1−λ)·bench + λ·carrier at the four mix
    * levels), the probed-cell detector pass at the loosest grid
    * threshold, and the per-(level, threshold) recall/wrong-bench
    * aggregation. */
  def decontaminationEvalReport(nprobe: Int = 2): String = {
    val dotENC = "list_reduce(list_transform(list_zip(en.v, c.cv), " +
      "z -> z[1] * z[2]), (p,q) -> p + q)"
    s"""WITH $normCte,
lv(level, lam, li) AS (VALUES
  ('copy', CAST(0.0 AS DOUBLE), 0), ('light', CAST(0.1 AS DOUBLE), 1),
  ('medium', CAST(0.3 AS DOUBLE), 2), ('heavy', CAST(0.5 AS DOUBLE), 3)),
th(threshold) AS (VALUES (CAST(0.95 AS DOUBLE)), (CAST(0.8 AS DOUBLE)),
  (CAST(0.6 AS DOUBLE))),
benchraw AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 10 = 3),
carrier AS (SELECT vec_id + 3 AS bench_id, v AS cv FROM e),
leaks AS (SELECT 1000000 + b.bench_id * 10 + lv.li AS vec_id,
    b.bench_id AS truth_bench, lv.level, lv.lam,
    list_transform(list_zip(b.bv, c.cv),
      z -> (1 - lv.lam) * z[1] + lv.lam * z[2]) AS v
  FROM benchraw b JOIN carrier c USING (bench_id) CROSS JOIN lv),
evalc AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 3
          UNION ALL SELECT vec_id, v FROM leaks),
en AS (SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
       FROM evalc),
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
trainasg AS (SELECT vec_id, cid AS cluster, v, nrm FROM (
    SELECT en.vec_id, c.cid, en.v, en.nrm,
           row_number() OVER (PARTITION BY en.vec_id
             ORDER BY $dotENC / (en.nrm * c.cn) DESC, c.cid) AS rn
    FROM en CROSS JOIN cents c) t WHERE rn = 1),
benchprobe AS (SELECT vec_id AS bench_id, cid AS cluster, v, nrm FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id % 10 = 3) t WHERE rn <= $nprobe),
scont AS (SELECT x.vec_id, y.bench_id,
    round($dotXY / (x.nrm * y.nrm), 4) AS cosine
  FROM trainasg x JOIN benchprobe y ON x.cluster = y.cluster
  WHERE round($dotXY / (x.nrm * y.nrm), 4) >= 0.6),
tagged AS (SELECT l.level, l.lam, (s.bench_id = l.truth_bench) AS hit,
    s.cosine
  FROM scont s JOIN leaks l ON s.vec_id = l.vec_id),
tc AS (SELECT level, lam, CAST(count(*) AS BIGINT) AS n_truth
       FROM leaks GROUP BY 1, 2),
dagg AS (SELECT level, lam, threshold,
    CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS nd,
    CAST(count(*) FILTER (WHERE NOT hit) AS BIGINT) AS nw
  FROM tagged CROSS JOIN th WHERE cosine >= threshold GROUP BY 1, 2, 3)
SELECT tc.level, tc.lam, th.threshold, tc.n_truth,
  coalesce(dagg.nd, 0) AS n_detected,
  round(CAST(coalesce(dagg.nd, 0) AS DOUBLE) / tc.n_truth, 4) AS recall,
  coalesce(dagg.nw, 0) AS n_wrong_bench
FROM tc CROSS JOIN th
LEFT JOIN dagg ON dagg.level = tc.level AND dagg.lam = tc.lam
  AND dagg.threshold = th.threshold
ORDER BY tc.lam, th.threshold"""
  }

  /** Mirrors the semdedup_incremental query — one epoch of
    * StreamingSemdedup.processBatch composed as a batch: the batch
    * (vec_id % 10 = 7) is SemDeDup'ed internally (keeper rule inside
    * its clusters, same domination order as semdedupKeepers), then
    * against the corpus index (vec_id % 10 ≠ 7) stored as int8 codes —
    * a batch vector is dropped when a same-cluster index row scores ADC
    * cosine ≥ threshold (float batch vector against code doubles,
    * scales cancel). */
  def semdedupIncremental(threshold: Double = 0.45,
      maxCluster: Long = 100000L): String = s"""WITH $quantCte,
n AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
      FROM e),
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
asg AS (
  SELECT vec_id, cid AS cluster, v, nrm, round(d / (nrm * cn), 4) AS ccos FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm, c.cn, $dotNC AS d,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
ba AS (SELECT * FROM asg WHERE vec_id % 10 = 7),
bkeep AS (SELECT cluster FROM ba GROUP BY cluster HAVING count(*) <= $maxCluster),
bca AS (SELECT ba.* FROM ba JOIN bkeep USING (cluster)),
bremoved AS (
  SELECT DISTINCT x.vec_id FROM bca x JOIN bca y
    ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
  WHERE round($dotXY / (x.nrm * y.nrm), 4) >= $threshold
    AND (y.ccos < x.ccos OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))),
internal AS (SELECT * FROM ba
  WHERE vec_id NOT IN (SELECT vec_id FROM bremoved)),
idxn AS (SELECT a.cluster,
           list_transform(q.qc, x -> CAST(x AS DOUBLE)) AS qd
         FROM asg a JOIN q ON a.vec_id = q.vec_id
         WHERE a.vec_id % 10 <> 7),
idxq AS (SELECT cluster, qd,
           sqrt(list_reduce(list_transform(qd, x -> x * x), (a,b) -> a + b)) AS qn
         FROM idxn),
dups AS (
  SELECT DISTINCT i.vec_id FROM internal i JOIN idxq ix
    ON i.cluster = ix.cluster
  WHERE round(list_reduce(list_transform(list_zip(i.v, ix.qd), z -> z[1] * z[2]),
        (p, q2) -> p + q2) / (i.nrm * ix.qn), 4) >= $threshold)
SELECT vec_id, cluster FROM internal
WHERE vec_id NOT IN (SELECT vec_id FROM dups)
ORDER BY vec_id"""

  /** Shared quantization CTEs mirroring Quantization.quantize:
    * symmetric per-vector max-abs int8 codes, HALF_UP rounding (both
    * engines round doubles half away from zero), scale 1.0 for the
    * all-zero vector. */
  private val quantCte = """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
s AS (SELECT vec_id, v, CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM e) t),
q AS (SELECT vec_id, scale, list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qc FROM s)"""

  /** Mirrors the embedding_quantize query: one row per (vector, dim)
    * with the int8 code — every code value-checked. */
  def embeddingQuantize(dim: Int = 64): String = s"""WITH $quantCte
SELECT vec_id, round(scale, 6) AS scale,
  unnest(${(0 until dim).mkString("[", ",", "]")}) AS dim,
  unnest(qc) AS qval
FROM q ORDER BY vec_id, dim"""

  /** Mirrors Quantization.quantizedTopK(k=5): exact top-k by cosine of
    * the int8 CODE vectors (scales cancel in cosine). */
  val annQuantizedTopK: String = s"""WITH $quantCte,
d AS (SELECT vec_id, list_transform(qc, x -> CAST(x AS DOUBLE)) AS v FROM q),
nq AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
       FROM d),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round($dotAB / (a.nrm * b.nrm), 4) AS cosine_q
  FROM nq a JOIN nq b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount})
SELECT query_id, neighbor_id, cosine_q, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, neighbor_id) AS rank
  FROM scored) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors Quantization.ivfQuantizedTopK(nlist=8, nprobe=2, k=5):
    * centroids/assignment/probing on the FLOAT vectors (same rules as
    * annIvfTopK), scoring asymmetric — float query against int8 codes
    * (scales cancel in cosine). */
  val annIvfSq8TopK: String = s"""WITH $quantCte,
n AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
      FROM e),
nn AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
       FROM (SELECT vec_id, list_transform(qc, x -> CAST(x AS DOUBLE)) AS v FROM q) d),
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
assign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster FROM (
    SELECT n.vec_id, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
corpusq AS (SELECT a.neighbor_id, a.cluster, nn.v AS cv, nn.nrm AS cn2
            FROM assign a JOIN nn ON a.neighbor_id = nn.vec_id),
probes AS (
  SELECT vec_id AS query_id, cid AS cluster, v AS qv, nrm AS qn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id < ${EmbeddingOps.DemoQueryCount}) t
  WHERE rn <= 2),
cand AS (
  SELECT query_id, neighbor_id,
         round(list_reduce(list_transform(list_zip(qv, cv), z -> z[1] * z[2]),
               (x,y) -> x + y) / (qn * cn2), 4) AS cosine_adc
  FROM probes JOIN corpusq USING (cluster)
  WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, cosine_adc, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_adc DESC, neighbor_id) AS rank FROM cand) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors Quantization.recallAtK(k=5): recall@5 of the int8 top-k vs
    * the exact float top-k (integer hit counts, one double division)
    * plus the decimal-summed mean reconstruction error. */
  // ───────────────────── product quantization ─────────────────────

  /** PQ building blocks shared by the three pq_* oracles. Mirrors
    * ProductQuantization with m=8 subspaces, ksub=16, dsub=8 over the
    * 64-dim demo embeddings: vectors are unit-normalized (norm 0 → 1
    * guard, same as the int8 scale guard), the codebook entry (sub,
    * code) is subvector `sub` of the normalized vector with
    * vec_id=code < 16 (the seed-vector tier, exactly like the `vec_id
    * < nlist` coarse centroids), and encoding picks the per-subspace
    * entry with the smallest left-to-right squared-L2, ties to the
    * smaller code — the same strict-< ascending scan as the
    * pqEncode kernel. */
  /** Seed-tier codebook CTE at an arbitrary ksub — entry (s, c) is
    * subvector s of unit vector c (`vec_id < ksub`), mirroring
    * `ProductQuantization.demoCodebook`. ksub=256 is the faiss-PQ8
    * production codebook shape (round-14 verdict ask #4). */
  private def seedCbvK(ksub: Int) =
    s"""cbv AS (SELECT c.vec_id AS code, subs.sub AS sub,
          list_slice(c.uv, subs.sub * 8 + 1, subs.sub * 8 + 8) AS cv
        FROM u c CROSS JOIN subs WHERE c.vec_id < $ksub)"""

  private val seedCbv = seedCbvK(16)

  /** The PQ chain with a pluggable codebook: `cbvSql` must end in a CTE
    * named `cbv` with columns (code, sub, cv) — the seed tier above, or
    * [[KmeansOracles.trainedCbv]]'s recomputed Lloyd codebook. */
  private[text] def pqChain(cbvSql: String): String = s"""$normCte,
u AS (SELECT vec_id, list_transform(v, x -> x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)) AS uv FROM n),
subs AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS sub),
$cbvSql,
enc AS (SELECT vec_id, sub, code FROM (
  SELECT x.vec_id, cb.sub, cb.code,
         row_number() OVER (PARTITION BY x.vec_id, cb.sub ORDER BY
           list_reduce(list_transform(
             list_zip(list_slice(x.uv, cb.sub * 8 + 1, cb.sub * 8 + 8), cb.cv),
             z -> (z[1] - z[2]) * (z[1] - z[2])), (p, q2) -> p + q2) ASC,
           cb.code ASC) AS rn
  FROM u x CROSS JOIN cbv cb) t WHERE rn = 1),
rec AS (SELECT e2.vec_id, flatten(list(cb.cv ORDER BY e2.sub)) AS rv
        FROM enc e2 JOIN cbv cb ON e2.sub = cb.sub AND e2.code = cb.code
        GROUP BY e2.vec_id),
rn2 AS (SELECT vec_id, rv,
          CASE WHEN sqrt(list_reduce(list_transform(rv, x -> x * x), (p, q2) -> p + q2)) = 0
               THEN 1.0
               ELSE sqrt(list_reduce(list_transform(rv, x -> x * x), (p, q2) -> p + q2)) END AS rn
        FROM rec)"""

  private val pqCte = pqChain(seedCbv)

  /** Mirrors the pq_encode query: one row per (vector, subspace) with
    * the chosen code — every code value-checked. */
  val pqEncode: String = s"""WITH $pqCte
SELECT vec_id, sub, code FROM enc ORDER BY vec_id, sub"""

  /** Mirrors pq_encode_256 — the PRODUCTION codebook shape (faiss PQ8:
    * m=8, ksub=256, one full byte per code): every code over the
    * 2048-entry codebook value-checked. */
  val pqEncode256: String = s"""WITH ${pqChain(seedCbvK(256))}
SELECT vec_id, sub, code FROM enc ORDER BY vec_id, sub"""

  /** Mirrors ProductQuantization.adcTopK(k=5): float queries against
    * decoded reconstructions (asymmetric distance computation). */
  val annPqTopK: String = s"""WITH $pqCte,
cand AS (SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
           round(list_reduce(list_transform(list_zip(q.v, r.rv), z -> z[1] * z[2]),
                 (p, q2) -> p + q2) / (q.nrm * r.rn), 4) AS cosine_pq
         FROM n q CROSS JOIN rn2 r
         WHERE q.vec_id < ${EmbeddingOps.DemoQueryCount} AND q.vec_id <> r.vec_id)
SELECT query_id, neighbor_id, cosine_pq, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM cand) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors ProductQuantization.ivfPqTopK(nlist=8, nprobe=2, k=5):
    * coarse centroids/assignment/probing on the FLOAT vectors (same
    * rules as annIvfTopK), ADC scoring of float queries against the
    * PQ reconstructions. */
  private val ivfPqCandChain: String = ivfPqCandChainOver()

  /** [[ivfPqCandChain]] with a parameterized NEIGHBOR-side predicate —
    * the post-deletion serving oracle admits only surviving vectors as
    * neighbors while centroids, codebook and the query set stay the
    * full-corpus demo artifacts (the frozen-model deletion contract). */
  private def ivfPqCandChainOver(
      neighborPred: String = "TRUE"): String = s"""$pqCte,
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
assign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster FROM (
    SELECT n.vec_id, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c) t WHERE rn = 1),
corpuspq AS (SELECT a.neighbor_id, a.cluster, r.rv, r.rn
             FROM assign a JOIN rn2 r ON a.neighbor_id = r.vec_id
             WHERE $neighborPred),
probes AS (
  SELECT vec_id AS query_id, cid AS cluster, v AS qv, nrm AS qn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN cents c WHERE n.vec_id < ${EmbeddingOps.DemoQueryCount}) t
  WHERE rn <= 2),
cand AS (
  SELECT query_id, neighbor_id,
         round(list_reduce(list_transform(list_zip(qv, rv), z -> z[1] * z[2]),
               (p, q2) -> p + q2) / (qn * rn), 4) AS cosine_pq
  FROM probes JOIN corpuspq USING (cluster)
  WHERE query_id <> neighbor_id)"""

  val annIvfPqTopK: String = annIvfPqTopKOver()

  /** [[annIvfPqTopK]] over a restricted neighbor set (post-deletion
    * serving). */
  def annIvfPqTopKOver(neighborPred: String = "TRUE"): String =
    s"""WITH ${ivfPqCandChainOver(neighborPred)}
SELECT query_id, neighbor_id, cosine_pq, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM cand) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors ProductQuantization.ivfPqRerankTopK(k=5, rerankK=50): the
    * IVF+PQ ADC candidates are cut to the top rerankK per query, then
    * re-scored with the EXACT float cosine (faiss's refine convention)
    * and cut to k. */
  def annIvfPqRerankTopK(rerankK: Int = 50): String = s"""WITH $ivfPqCandChain,
cadc AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM cand) t
  WHERE rank <= $rerankK),
rr AS (SELECT ca.query_id, ca.neighbor_id,
         round(list_reduce(list_transform(list_zip(q.v, b.v), z -> z[1] * z[2]),
               (p, q2) -> p + q2) / (q.nrm * b.nrm), 4) AS cosine
       FROM cadc ca JOIN n q ON q.vec_id = ca.query_id
                    JOIN n b ON b.vec_id = ca.neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rank FROM rr) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors ProductQuantization.rerankRecallAtK(k=5, rerankK=50): ONE
    * row comparing recall@5 of the pure-ADC IVF+PQ top-k and of the
    * reranked top-k against the exact float top-k — the report that
    * shows what the refine stage buys. */
  def pqRerankRecall(rerankK: Int = 50): String = s"""WITH $ivfPqCandChain,
exact AS (SELECT query_id, neighbor_id FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round($dotAB / (a.nrm * b.nrm), 4) DESC, b.vec_id) AS rank
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount}) t WHERE rank <= 5),
adc AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM cand) t
  WHERE rank <= 5),
cadc AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM cand) t
  WHERE rank <= $rerankK),
rr AS (SELECT query_id, neighbor_id FROM (
  SELECT ca.query_id, ca.neighbor_id,
         row_number() OVER (PARTITION BY ca.query_id
           ORDER BY round(list_reduce(list_transform(list_zip(q.v, b.v), z -> z[1] * z[2]),
                 (p, q2) -> p + q2) / (q.nrm * b.nrm), 4) DESC, ca.neighbor_id) AS rank
  FROM cadc ca JOIN n q ON q.vec_id = ca.query_id
               JOIN n b ON b.vec_id = ca.neighbor_id) t WHERE rank <= 5),
ha AS (SELECT count(*) AS hits_adc FROM exact JOIN adc USING (query_id, neighbor_id)),
hr AS (SELECT count(*) AS hits_rerank FROM exact JOIN rr USING (query_id, neighbor_id)),
nqs AS (SELECT count(DISTINCT query_id) AS n_queries FROM exact)
SELECT 5 AS k, n_queries,
       round(CAST(hits_adc AS DOUBLE) / (n_queries * 5), 4) AS recall_adc,
       round(CAST(hits_rerank AS DOUBLE) / (n_queries * 5), 4) AS recall_rerank
FROM nqs CROSS JOIN ha CROSS JOIN hr"""

  /** Mirrors ProductQuantization.recallAtK(k=5): recall@5 of the ADC
    * top-k vs the exact float top-k, plus the decimal-summed mean
    * |u_i − rec_i| reconstruction error against the NORMALIZED
    * vectors (the quantity PQ approximates). */
  private[text] def pqRecallWith(chain: String): String = s"""WITH $chain,
exact AS (SELECT query_id, neighbor_id FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round($dotAB / (a.nrm * b.nrm), 4) DESC, b.vec_id) AS rank
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount}) t WHERE rank <= 5),
pq AS (SELECT query_id, neighbor_id FROM (
  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY round(list_reduce(list_transform(list_zip(q.v, r.rv), z -> z[1] * z[2]),
                   (p, q2) -> p + q2) / (q.nrm * r.rn), 4) DESC, r.vec_id) AS rank
  FROM n q CROSS JOIN rn2 r
  WHERE q.vec_id < ${EmbeddingOps.DemoQueryCount} AND q.vec_id <> r.vec_id) t
  WHERE rank <= 5),
hits AS (SELECT count(*) AS total_hits FROM exact JOIN pq USING (query_id, neighbor_id)),
nqs AS (SELECT count(DISTINCT query_id) AS n_queries FROM exact),
err AS (SELECT round(CAST(sum(CAST(round(e, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_abs_err
        FROM (SELECT unnest(list_transform(list_zip(u.uv, r.rv),
                z -> abs(z[1] - z[2]))) AS e
              FROM u JOIN rec r USING (vec_id)) t)
SELECT 5 AS k, n_queries,
       round(CAST(total_hits AS DOUBLE) / (n_queries * 5), 4) AS recall_at_k,
       mean_abs_err
FROM hits CROSS JOIN nqs CROSS JOIN err"""

  val pqRecall: String = pqRecallWith(pqCte)

  val quantizationRecall: String = s"""WITH $quantCte,
n AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
      FROM e),
nq AS (SELECT vec_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x), (a,b) -> a + b)) AS nrm
       FROM (SELECT vec_id, list_transform(qc, x -> CAST(x AS DOUBLE)) AS v FROM q) d),
exact AS (SELECT query_id, neighbor_id FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round($dotAB / (a.nrm * b.nrm), 4) DESC, b.vec_id) AS rank
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount}) t WHERE rank <= 5),
quant AS (SELECT query_id, neighbor_id FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round($dotAB / (a.nrm * b.nrm), 4) DESC, b.vec_id) AS rank
  FROM nq a JOIN nq b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount}) t WHERE rank <= 5),
hits AS (SELECT count(*) AS total_hits FROM exact JOIN quant USING (query_id, neighbor_id)),
nqs AS (SELECT count(DISTINCT query_id) AS n_queries FROM exact),
err AS (SELECT round(CAST(sum(CAST(round(e, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_abs_err
        FROM (SELECT unnest(list_transform(list_zip(s.v, q.qc),
                z -> abs(z[1] - CAST(z[2] AS DOUBLE) * s.scale))) AS e
              FROM s JOIN q USING (vec_id)) t)
SELECT 5 AS k, n_queries,
       round(CAST(total_hits AS DOUBLE) / (n_queries * 5), 4) AS recall_at_k,
       mean_abs_err
FROM hits CROSS JOIN nqs CROSS JOIN err"""

  /** Same md5-prefix hash bucket as Sampling.bucket (cf. OracleSql). */
  private def bucketSql(key: String): String =
    s"CAST(CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS BIGINT)"

  /** Shared CTE chain replaying Classifier.nbPredict: md5-bucket
    * train/test split, non-zero (class, term) counts, and the decimal
    * log-sum scoring with the zero-count-cells-fold-to-the-linear-term
    * identity. Every ln is rounded to 6 dp before the DECIMAL sum,
    * mirroring the engine exactly. */
  private val nbScoredCte = s"""b AS (
  SELECT doc_id, lang, text, ${bucketSql("doc_id")} AS bk FROM documents),
trd AS (SELECT doc_id, lang, $toks AS toks FROM b WHERE bk < 8000),
ted AS (SELECT doc_id, lang, $toks AS toks FROM b WHERE bk >= 8000),
trt AS (SELECT lang AS label, unnest(toks) AS term FROM trd),
tet AS (SELECT doc_id, unnest(toks) AS term FROM ted),
tc AS (SELECT label, term, count(*) AS cnt FROM trt GROUP BY 1, 2),
ct AS (SELECT label, sum(cnt) AS tokens_c FROM tc GROUP BY 1),
vocab AS (SELECT DISTINCT term FROM tc),
vs AS (SELECT count(*) AS v FROM vocab),
nt AS (SELECT count(*) AS n_train FROM trd),
cls AS (SELECT cd.label,
    CAST(round(ln(CAST(cd.n_docs_c AS DOUBLE)), 6) AS DECIMAL(18,6))
      - CAST(round(ln(CAST(nt.n_train AS DOUBLE)), 6) AS DECIMAL(18,6)) AS log_prior,
    CAST(round(ln(CAST(ct.tokens_c + vs.v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS log_denom
  FROM (SELECT lang AS label, count(*) AS n_docs_c FROM trd GROUP BY 1) cd
  JOIN ct ON cd.label = ct.label CROSS JOIN vs CROSS JOIN nt),
mc AS (SELECT tet.doc_id, tc.label,
    sum(CAST(round(ln(CAST(tc.cnt + 1 AS DOUBLE)), 6) AS DECIMAL(18,6))) AS s_match
  FROM tet JOIN tc USING (term) GROUP BY 1, 2),
lv AS (SELECT tet.doc_id, count(*) AS len_v FROM tet JOIN vocab USING (term) GROUP BY 1),
sc AS (SELECT d.doc_id, d.lang AS label_true, c.label,
    c.log_prior - COALESCE(lv.len_v, 0) * c.log_denom
      + COALESCE(mc.s_match, CAST(0 AS DECIMAL(18,6))) AS score
  FROM ted d CROSS JOIN cls c
  LEFT JOIN mc ON mc.doc_id = d.doc_id AND mc.label = c.label
  LEFT JOIN lv ON lv.doc_id = d.doc_id),
pred AS (SELECT doc_id, label_true, label AS label_pred,
    CAST(round(score, 4) AS DOUBLE) AS score
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc) t
  WHERE rn = 1)"""

  /** Mirrors Classifier.nbPredict over documents(lang). */
  val nbPredict: String = s"""WITH $nbScoredCte
SELECT doc_id, label_true, label_pred, score FROM pred ORDER BY doc_id"""

  /** Mirrors Classifier.accuracyReport(nbPredict). */
  val nbReport: String = s"""WITH $nbScoredCte
SELECT label_true AS label, count(*) AS n_test,
  CAST(sum(CASE WHEN label_pred = label_true THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  CAST(sum(CASE WHEN label_pred = label_true THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) AS accuracy
FROM pred GROUP BY 1 ORDER BY 1"""

  /** Mirrors Classifier.nbPredictHashed: the same train/test split and
    * decimal log-sum scoring as [[nbPredict]], but over the DSIR hashed
    * unigram+bigram cells (md5-prefix hash mod 1e9+7 mod buckets) with
    * the FIXED alphabet size as the smoothing constant and the
    * document's total gram count as the linear-term multiplier. */
  def nbPredictHashed(buckets: Int = 1024): String = s"""WITH b AS (
  SELECT doc_id, lang, text, ${bucketSql("doc_id")} AS bk FROM documents),
d0 AS (SELECT doc_id, lang, bk, $toks AS toks FROM b),
g0 AS (SELECT doc_id, lang, bk,
    list_concat(toks, CASE WHEN len(toks) >= 2
      THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
      ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM d0),
g AS (SELECT doc_id, lang, bk,
    (CAST(('0x' || substr(md5(gr), 1, 15)) AS BIGINT) % 1000000007) % $buckets AS cell
  FROM (SELECT doc_id, lang, bk, unnest(grams) AS gr FROM g0)),
tc AS (SELECT lang AS label, cell, count(*) AS cnt FROM g WHERE bk < 8000 GROUP BY 1, 2),
ct AS (SELECT label, sum(cnt) AS tokens_c FROM tc GROUP BY 1),
nt AS (SELECT count(*) AS n_train FROM b WHERE bk < 8000),
cls AS (SELECT cd.label,
    CAST(round(ln(CAST(cd.n_docs_c AS DOUBLE)), 6) AS DECIMAL(18,6))
      - CAST(round(ln(CAST(nt.n_train AS DOUBLE)), 6) AS DECIMAL(18,6)) AS log_prior,
    CAST(round(ln(CAST(ct.tokens_c + $buckets AS DOUBLE)), 6) AS DECIMAL(18,6)) AS log_denom
  FROM (SELECT lang AS label, count(*) AS n_docs_c FROM b WHERE bk < 8000 GROUP BY 1) cd
  JOIN ct ON cd.label = ct.label CROSS JOIN nt),
tg AS (SELECT doc_id, cell FROM g WHERE bk >= 8000),
mc AS (SELECT tg.doc_id, tc.label,
    sum(CAST(round(ln(CAST(tc.cnt + 1 AS DOUBLE)), 6) AS DECIMAL(18,6))) AS s_match
  FROM tg JOIN tc USING (cell) GROUP BY 1, 2),
ng AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1),
sc AS (SELECT d.doc_id, d.lang AS label_true, c.label,
    c.log_prior - COALESCE(ng.n_grams, 0) * c.log_denom
      + COALESCE(mc.s_match, CAST(0 AS DECIMAL(18,6))) AS score
  FROM (SELECT doc_id, lang FROM b WHERE bk >= 8000) d CROSS JOIN cls c
  LEFT JOIN mc ON mc.doc_id = d.doc_id AND mc.label = c.label
  LEFT JOIN ng ON ng.doc_id = d.doc_id)
SELECT doc_id, label_true, label AS label_pred,
  CAST(round(score, 4) AS DOUBLE) AS score
FROM (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc) t
WHERE rn = 1 ORDER BY doc_id"""

  /** Mirrors Dsir.importanceWeights over documents with the lang='en'
    * seed slice as target: hashed unigram+bigram cells (shared md5-prefix
    * hash mod buckets), Laplace-smoothed per-cell log ratio rounded to
    * 6 dp, decimal-summed per raw document. */
  def dsirImportance(buckets: Int = 1024): String = s"""WITH d AS (
  SELECT doc_id, lang = 'en' AS is_target, $toks AS toks FROM documents),
g0 AS (SELECT doc_id, is_target,
    list_concat(toks, CASE WHEN len(toks) >= 2
      THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
      ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM d),
g AS (SELECT doc_id, is_target,
    (CAST(('0x' || substr(md5(gr), 1, 15)) AS BIGINT) % 1000000007) % $buckets AS cell
  FROM (SELECT doc_id, is_target, unnest(grams) AS gr FROM g0)),
cc AS (SELECT cell,
    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tc,
    CAST(sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS BIGINT) AS rc
  FROM g GROUP BY 1),
tot AS (SELECT
    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tt,
    CAST(sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS BIGINT) AS rt
  FROM g),
cr AS (SELECT cell,
    CAST(round(ln(CAST(tc + 1 AS DOUBLE) / (tt + $buckets))
             - ln(CAST(rc + 1 AS DOUBLE) / (rt + $buckets)), 6)
      AS DECIMAL(18,6)) AS lr
  FROM cc CROSS JOIN tot)
SELECT doc_id, count(*) AS n_grams,
  CAST(round(sum(lr), 4) AS DOUBLE) AS log_weight
FROM g JOIN cr USING (cell) WHERE NOT is_target
GROUP BY 1 ORDER BY doc_id"""

  /** Mirrors Sampling.topFractionByScore(permille=300) over the DSIR
    * importance weights: micro-unit histogram, descending cumulative
    * counts, ⌈n·300/1000⌉ tie-inclusive threshold. */
  def dsirTopSelect(buckets: Int = 1024): String = s"""WITH dw AS (
${dsirImportance(buckets)}),
g2 AS (SELECT doc_id, n_grams, log_weight,
         CAST(round(log_weight * 10000) AS BIGINT) AS m FROM dw),
h AS (SELECT m, count(*) AS cnt FROM g2 GROUP BY m),
c AS (SELECT m,
        sum(cnt) OVER (ORDER BY m DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n
      FROM h),
thr AS (SELECT max(CASE WHEN cum >= (n * 300 + 999) // 1000 THEN m END)
          AS th FROM c)
SELECT doc_id, n_grams, log_weight
FROM g2 CROSS JOIN thr WHERE m >= th ORDER BY doc_id"""

  /** Mirrors Classifier.centroidPredict over embeddings(label):
    * micro-unit integer-sum centroids (exact, order-independent), then
    * the standard left-to-right cosine fold against each class. The
    * component index list is derived per-row (`range(0, len(v))`), so
    * the zip against the micro list is exact at ANY dimensionality —
    * a literal index list would silently null-pad or truncate if the
    * table's dimension changed. */
  def centroidPredict(): String = {
    s"""WITH b AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         ${bucketSql("vec_id")} AS bk
  FROM embeddings),
tr AS (SELECT * FROM b WHERE bk < 8000),
te AS (SELECT vec_id, label AS label_true, v,
         CASE WHEN n0 = 0 THEN 1.0 ELSE n0 END AS nrm
       FROM (SELECT *, sqrt(list_reduce(list_transform(v, x -> x * x),
               (p,q) -> p + q)) AS n0
             FROM b WHERE bk >= 8000) s),
comps AS (SELECT label, unnest(range(0, len(v))) AS dim,
    unnest(list_transform(v, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))) AS micro
  FROM tr),
cent AS (SELECT label, dim,
    CAST(sum(micro) AS DOUBLE) / count(*) / 1e6 AS c
  FROM comps GROUP BY 1, 2),
cv AS (SELECT label, cv,
    CASE WHEN c0 = 0 THEN 1.0 ELSE c0 END AS cnrm
  FROM (SELECT label, list(c ORDER BY dim) AS cv,
          sqrt(list_reduce(list_transform(list(c ORDER BY dim), x -> x * x),
            (p,q) -> p + q)) AS c0
        FROM cent GROUP BY 1) s),
sc AS (SELECT te.vec_id, te.label_true, cv.label,
    round(list_reduce(list_transform(list_zip(te.v, cv.cv), z -> z[1] * z[2]),
      (p,q) -> p + q) / (te.nrm * cv.cnrm), 6) AS cosine
  FROM te CROSS JOIN cv)
SELECT vec_id, label_true, label AS label_pred, cosine
FROM (SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, label) AS rn FROM sc) t
WHERE rn = 1 ORDER BY vec_id"""
  }

  /**
   * CTE chain replaying `LogisticRegression.trainWeights` over
   * documents with the seed-word label `list_contains(toks, 'spark')`
   * — every gradient-descent iteration unrolled (the
   * [[KmeansOracles]] discipline applied to a distributed trainer):
   * hashed unigram+bigram PRESENCE cells, md5-bucket train slice,
   * per-iteration exact-decimal z sums, the 6-dp-rounded sigmoid as
   * the only transcendental, exact-decimal gradients, and the 6-dp
   * step subtracted in decimal. Ends in `qlw{iters}(cell, w)` — the
   * engine's weight table bit-for-bit.
   */
  private def lrChain(buckets: Int, iters: Int, step: Double): String = {
    val sb = new StringBuilder
    sb ++= s"""qlb AS MATERIALIZED (
  SELECT doc_id, text, ${bucketSql("doc_id")} AS bk,
         CASE WHEN list_contains($toks, 'spark') THEN 1 ELSE 0 END AS y
  FROM documents),
qlg AS MATERIALIZED (SELECT doc_id, y, bk,
    list_concat(toks, CASE WHEN len(toks) >= 2
      THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
      ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM (SELECT doc_id, y, bk, $toks AS toks FROM qlb) qlg0),
qlf AS MATERIALIZED (SELECT DISTINCT doc_id, y, bk,
    (CAST(('0x' || substr(md5(gr), 1, 15)) AS BIGINT) % 1000000007) % $buckets AS cell
  FROM (SELECT doc_id, y, bk, unnest(grams) AS gr FROM qlg) qlf0),
qltr AS MATERIALIZED (SELECT doc_id, y, cell FROM qlf WHERE bk < 8000),
qln AS MATERIALIZED (SELECT count(DISTINCT doc_id) AS n FROM qltr),
qlw0 AS MATERIALIZED (SELECT CAST(-1 AS BIGINT) AS cell, CAST(0 AS DECIMAL(18,6)) AS w)"""
    for (i <- 1 to iters) {
      val prev = s"qlw${i - 1}"
      sb ++= s""",
qlz$i AS MATERIALIZED (SELECT f.doc_id, f.y,
    sum(CAST(coalesce(w.w, 0) AS DECIMAL(28,6))) AS zsum
  FROM qltr f LEFT JOIN (SELECT * FROM $prev WHERE cell >= 0) w USING (cell)
  GROUP BY 1, 2),
qle$i AS MATERIALIZED (SELECT z.doc_id,
    CAST(CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
        + exp(-(CAST(b.w AS DOUBLE) + CAST(z.zsum AS DOUBLE)))), 6)
      AS DECIMAL(18,6)) - z.y AS DECIMAL(18,6)) AS err
  FROM qlz$i z CROSS JOIN (SELECT w FROM $prev WHERE cell = -1) b),
qlgc$i AS MATERIALIZED (SELECT f.cell, sum(CAST(e.err AS DECIMAL(28,6))) AS g
  FROM qltr f JOIN qle$i e USING (doc_id) GROUP BY 1),
qlgb$i AS MATERIALIZED (SELECT sum(CAST(err AS DECIMAL(28,6))) AS g FROM qle$i),
qlw$i AS MATERIALIZED (
  SELECT g.cell,
    CAST(coalesce(w.w, 0) - CAST(round(CAST($step AS DOUBLE)
        * CAST(g.g AS DOUBLE) / n.n, 6) AS DECIMAL(18,6))
      AS DECIMAL(18,6)) AS w
  FROM qlgc$i g CROSS JOIN qln n
  LEFT JOIN (SELECT * FROM $prev WHERE cell >= 0) w USING (cell)
  UNION ALL
  SELECT CAST(-1 AS BIGINT),
    CAST(b.w - CAST(round(CAST($step AS DOUBLE)
        * CAST(g.g AS DOUBLE) / n.n, 6) AS DECIMAL(18,6))
      AS DECIMAL(18,6))
  FROM qlgb$i g CROSS JOIN qln n
  CROSS JOIN (SELECT w FROM $prev WHERE cell = -1) b)"""
    }
    sb.toString
  }

  /** Mirrors the classify_quality_lr query (and its from-model serve
    * twin — persistence is a decimal pass-through): the trained weight
    * table scored over the held-out slice. */
  def classifyQualityLr(buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0): String = s"""WITH ${lrChain(buckets, iters, step)},
qlte AS MATERIALIZED (SELECT doc_id, y, cell FROM qlf WHERE bk >= 8000),
qlzt AS MATERIALIZED (SELECT f.doc_id, f.y,
    sum(CAST(coalesce(w.w, 0) AS DECIMAL(28,6))) AS zsum
  FROM qlte f LEFT JOIN (SELECT * FROM qlw$iters WHERE cell >= 0) w USING (cell)
  GROUP BY 1, 2),
qlp AS MATERIALIZED (SELECT z.doc_id, z.y,
    CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
        + exp(-(CAST(b.w AS DOUBLE) + CAST(z.zsum AS DOUBLE)))), 6)
      AS DECIMAL(18,6)) AS p
  FROM qlzt z CROSS JOIN (SELECT w FROM qlw$iters WHERE cell = -1) b)
SELECT doc_id, CAST(y AS BIGINT) AS label_true, CAST(p AS DOUBLE) AS prob,
  CAST(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS label_pred
FROM qlp ORDER BY doc_id"""

  /** Mirrors the classify_quality_lr_weights query: the descent's end
    * state verified cell by cell. */
  def classifyQualityLrWeights(buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0): String = s"""WITH ${lrChain(buckets, iters, step)}
SELECT cell, CAST(w AS DOUBLE) AS w FROM qlw$iters ORDER BY cell"""

  /** Mirrors the classify_quality_lr_calibration query: the descent
    * replayed, the probability served over ALL gram-bearing documents
    * (trainBuckets = 0), fixed decile bins, integer micro-unit mean
    * probability and 4-dp positive rate per bin. */
  def classifyQualityLrCalibration(buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0, bins: Int = 10): String =
    s"""WITH ${lrChain(buckets, iters, step)},
qca AS (SELECT f.doc_id, f.y,
    sum(CAST(coalesce(w.w, 0) AS DECIMAL(28,6))) AS zsum
  FROM (SELECT doc_id, y, cell FROM qlf) f
  LEFT JOIN (SELECT * FROM qlw$iters WHERE cell >= 0) w USING (cell)
  GROUP BY 1, 2),
qcp AS (SELECT z.doc_id, z.y,
    CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
        + exp(-(CAST(b.w AS DOUBLE) + CAST(z.zsum AS DOUBLE)))), 6)
      AS DECIMAL(18,6)) AS p
  FROM qca z CROSS JOIN (SELECT w FROM qlw$iters WHERE cell = -1) b),
qcb AS (SELECT
    least(CAST(floor(CAST(p AS DOUBLE) * $bins) AS BIGINT), ${bins - 1}) AS bin,
    y, CAST(round(CAST(p AS DOUBLE) * 1000000) AS BIGINT) AS m
  FROM qcp)
SELECT bin, count(*) AS n_docs,
  ((2 * sum(m) + count(*)) // (2 * count(*))) / 1000000.0 AS mean_prob,
  ((2 * sum(y) * 10000 + count(*)) // (2 * count(*))) / 10000.0 AS frac_positive
FROM qcb GROUP BY bin ORDER BY bin"""

  /**
   * CTE chain replaying `LogisticRegression.trainSoftmaxWeights` over
   * documents with the `lang` column as the K-class label — the
   * [[lrChain]] discipline extended to softmax: per-class weight rows
   * keyed (cell, cls), dense per-(doc, class) exact-decimal logits with
   * the intercept added in decimal, the max-shifted exp as the only
   * transcendental (6 dp), an exact-decimal denominator over the
   * bounded class set, and the 6-dp step subtracted in decimal. Ends in
   * `mlw{iters}(cell, cls, w)` — the engine's weight table bit-for-bit.
   */
  private def softmaxChain(buckets: Int, iters: Int, step: Double): String = {
    val sb = new StringBuilder
    sb ++= s"""mlb AS MATERIALIZED (
  SELECT doc_id, CAST(lang AS VARCHAR) AS y, ${bucketSql("doc_id")} AS bk, text
  FROM documents WHERE lang IS NOT NULL),
mlg AS MATERIALIZED (SELECT doc_id, y, bk,
    list_concat(toks, CASE WHEN len(toks) >= 2
      THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
      ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM (SELECT doc_id, y, bk, $toks AS toks FROM mlb) mlg0),
mlf AS MATERIALIZED (SELECT DISTINCT doc_id, y, bk,
    (CAST(('0x' || substr(md5(gr), 1, 15)) AS BIGINT) % 1000000007) % $buckets AS cell
  FROM (SELECT doc_id, y, bk, unnest(grams) AS gr FROM mlg) mlf0),
mltr AS MATERIALIZED (SELECT doc_id, y, cell FROM mlf WHERE bk < 8000),
mln AS MATERIALIZED (SELECT count(DISTINCT doc_id) AS n FROM mltr),
mld AS MATERIALIZED (SELECT DISTINCT doc_id, y FROM mltr),
mlw0 AS MATERIALIZED (SELECT CAST(-1 AS BIGINT) AS cell, cls,
  CAST(0 AS DECIMAL(18,6)) AS w
  FROM (SELECT DISTINCT y AS cls FROM mltr) c0)"""
    for (i <- 1 to iters) {
      val prev = s"mlw${i - 1}"
      sb ++= s""",
mlz$i AS MATERIALIZED (SELECT f.doc_id, w.cls,
    sum(CAST(w.w AS DECIMAL(28,6))) AS zs
  FROM mltr f JOIN (SELECT * FROM $prev WHERE cell >= 0) w USING (cell)
  GROUP BY 1, 2),
mlt$i AS MATERIALIZED (SELECT d.doc_id, d.y, b.cls,
    CAST(CAST(b.w AS DECIMAL(28,6)) + coalesce(z.zs, 0) AS DECIMAL(28,6)) AS zt
  FROM mld d CROSS JOIN (SELECT cls, w FROM $prev WHERE cell = -1) b
  LEFT JOIN mlz$i z ON z.doc_id = d.doc_id AND z.cls = b.cls),
mlp$i AS MATERIALIZED (SELECT doc_id, y, cls,
    CAST(round(CAST(e AS DOUBLE) / CAST(den AS DOUBLE), 6) AS DECIMAL(18,6)) AS p
  FROM (SELECT doc_id, y, cls, e,
      sum(CAST(e AS DECIMAL(28,6))) OVER (PARTITION BY doc_id) AS den
    FROM (SELECT doc_id, y, cls,
        CAST(round(exp(CAST(zt - max(zt) OVER (PARTITION BY doc_id)
          AS DOUBLE)), 6) AS DECIMAL(18,6)) AS e
      FROM mlt$i) q1) q2),
mle$i AS MATERIALIZED (SELECT doc_id, cls,
    CAST(p - CASE WHEN y = cls THEN 1 ELSE 0 END AS DECIMAL(18,6)) AS err
  FROM mlp$i),
mlgc$i AS MATERIALIZED (SELECT f.cell, e.cls,
    sum(CAST(e.err AS DECIMAL(28,6))) AS g
  FROM mltr f JOIN mle$i e USING (doc_id) GROUP BY 1, 2),
mlgb$i AS MATERIALIZED (SELECT cls, sum(CAST(err AS DECIMAL(28,6))) AS g
  FROM mle$i GROUP BY 1),
mlw$i AS MATERIALIZED (
  SELECT g.cell, g.cls,
    CAST(coalesce(w.w, 0) - CAST(round(CAST($step AS DOUBLE)
        * CAST(g.g AS DOUBLE) / n.n, 6) AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS w
  FROM mlgc$i g CROSS JOIN mln n
  LEFT JOIN (SELECT * FROM $prev WHERE cell >= 0) w
    ON w.cell = g.cell AND w.cls = g.cls
  UNION ALL
  SELECT CAST(-1 AS BIGINT), g.cls,
    CAST(b.w - CAST(round(CAST($step AS DOUBLE)
        * CAST(g.g AS DOUBLE) / n.n, 6) AS DECIMAL(18,6)) AS DECIMAL(18,6))
  FROM mlgb$i g CROSS JOIN mln n
  JOIN (SELECT cls, w FROM $prev WHERE cell = -1) b ON b.cls = g.cls)"""
    }
    sb.toString
  }

  /** Mirrors the classify_langid_lr query (and its from-model serve
    * twin — persistence is a decimal pass-through): the trained softmax
    * weight table scored over the held-out slice, argmax class with
    * ties to the ascending class name. */
  def classifyLangidLr(buckets: Int = 256, iters: Int = 12,
      step: Double = 3.0): String =
    s"""WITH ${softmaxChain(buckets, iters, step)},
mlte AS MATERIALIZED (SELECT doc_id, y, cell FROM mlf WHERE bk >= 8000),
mltd AS MATERIALIZED (SELECT DISTINCT doc_id, y FROM mlte),
mlzs AS MATERIALIZED (SELECT f.doc_id, w.cls,
    sum(CAST(w.w AS DECIMAL(28,6))) AS zs
  FROM mlte f JOIN (SELECT * FROM mlw$iters WHERE cell >= 0) w USING (cell)
  GROUP BY 1, 2),
mlts AS MATERIALIZED (SELECT d.doc_id, d.y, b.cls,
    CAST(CAST(b.w AS DECIMAL(28,6)) + coalesce(z.zs, 0) AS DECIMAL(28,6)) AS zt
  FROM mltd d CROSS JOIN (SELECT cls, w FROM mlw$iters WHERE cell = -1) b
  LEFT JOIN mlzs z ON z.doc_id = d.doc_id AND z.cls = b.cls),
mlps AS MATERIALIZED (SELECT doc_id, y, cls,
    CAST(round(CAST(e AS DOUBLE) / CAST(den AS DOUBLE), 6) AS DECIMAL(18,6)) AS p
  FROM (SELECT doc_id, y, cls, e,
      sum(CAST(e AS DECIMAL(28,6))) OVER (PARTITION BY doc_id) AS den
    FROM (SELECT doc_id, y, cls,
        CAST(round(exp(CAST(zt - max(zt) OVER (PARTITION BY doc_id)
          AS DOUBLE)), 6) AS DECIMAL(18,6)) AS e
      FROM mlts) q1) q2)
SELECT doc_id, y AS label_true, cls AS label_pred, CAST(p AS DOUBLE) AS prob
FROM (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY p DESC, cls) AS rn FROM mlps) t
WHERE rn = 1 ORDER BY doc_id"""

  /** Mirrors the classify_langid_lr_weights query: the softmax
    * descent's end state verified (cell, class) by (cell, class). */
  def classifyLangidLrWeights(buckets: Int = 256, iters: Int = 12,
      step: Double = 3.0): String =
    s"""WITH ${softmaxChain(buckets, iters, step)}
SELECT cell, cls, CAST(w AS DOUBLE) AS w FROM mlw$iters
ORDER BY cell, cls"""

  /**
   * Mirrors the ccnet_lang_triage query — the full CCNet composition:
   * the trained softmax identifier served over ALL gram-bearing
   * documents (trainBuckets = 0), each document's add-α bigram model
   * trained WITHIN its predicted-language partition (per-group model
   * relations), and the head/middle/tail exact-quantile cut applied
   * per language (histogram windows PARTITIONED by the predicted
   * language). The softmax descent replays via [[softmaxChain]]; the
   * LM and quantile chains are the [[lmPerplexityBuckets]] machinery
   * with the group riding in every key.
   */
  def ccnetLangTriage(buckets: Int = 256, iters: Int = 12,
      step: Double = 3.0): String =
    s"""WITH ${softmaxChain(buckets, iters, step)},
${ccnetServeCtes(iters)}
SELECT doc_id, g AS pred_lang, n_bigrams, lm_score,
  CASE WHEN m >= th THEN 'head'
       WHEN m >= tm THEN 'middle'
       ELSE 'tail' END AS bucket
FROM cgm JOIN cthr USING (g) ORDER BY doc_id"""

  /** The CCNet serve chain shared by [[ccnetLangTriage]] and
    * [[qualityStackMultilingual]]: softmax serve over all gram-bearing
    * documents (`cpred(doc_id, g)` — the predicted language), the
    * per-group add-α bigram LM score (`cgm(doc_id, g, n_bigrams,
    * lm_score, m)`), and the per-group head/mid thresholds
    * (`cthr(g, th, tm)`). Expects `mlf`/`mlw{iters}` from
    * [[softmaxChain]] in scope. */
  private def ccnetServeCtes(iters: Int): String =
    s"""cad AS MATERIALIZED (SELECT DISTINCT doc_id, y FROM mlf),
caz AS MATERIALIZED (SELECT f.doc_id, w.cls,
    sum(CAST(w.w AS DECIMAL(28,6))) AS zs
  FROM (SELECT DISTINCT doc_id, cell FROM mlf) f
  JOIN (SELECT * FROM mlw$iters WHERE cell >= 0) w USING (cell)
  GROUP BY 1, 2),
cat_ AS MATERIALIZED (SELECT d.doc_id, b.cls,
    CAST(CAST(b.w AS DECIMAL(28,6)) + coalesce(z.zs, 0) AS DECIMAL(28,6)) AS zt
  FROM cad d CROSS JOIN (SELECT cls, w FROM mlw$iters WHERE cell = -1) b
  LEFT JOIN caz z ON z.doc_id = d.doc_id AND z.cls = b.cls),
cap AS MATERIALIZED (SELECT doc_id, cls,
    CAST(round(CAST(e AS DOUBLE) / CAST(den AS DOUBLE), 6) AS DECIMAL(18,6)) AS p
  FROM (SELECT doc_id, cls, e,
      sum(CAST(e AS DECIMAL(28,6))) OVER (PARTITION BY doc_id) AS den
    FROM (SELECT doc_id, cls,
        CAST(round(exp(CAST(zt - max(zt) OVER (PARTITION BY doc_id)
          AS DOUBLE)), 6) AS DECIMAL(18,6)) AS e
      FROM cat_) q1) q2),
cpred AS MATERIALIZED (SELECT doc_id, cls AS g
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY p DESC, cls) AS rn FROM cap) t
  WHERE rn = 1),
ct AS MATERIALIZED (SELECT d.doc_id, p.g, $toks AS toks
  FROM documents d JOIN cpred p USING (doc_id)),
cbgp AS MATERIALIZED (SELECT doc_id, g,
    unnest(toks[1:len(toks)-1]) AS w1, unnest(toks[2:len(toks)]) AS w2
  FROM ct WHERE len(toks) >= 2),
ccb AS (SELECT g, w1, w2, count(*) AS c FROM cbgp GROUP BY 1, 2, 3),
cct AS (SELECT g, w1, sum(c) AS n FROM ccb GROUP BY 1, 2),
ccv AS (SELECT g, count(DISTINCT tok) AS vsz
  FROM (SELECT g, unnest(toks) AS tok FROM ct) GROUP BY g),
cj2 AS (SELECT doc_id, g, count(*) AS n_bigrams,
    CAST(sum(lp) * 1000000 AS BIGINT) AS s
  FROM (SELECT b.doc_id, b.g,
          CAST(round(ln((c + 0.5) / (n + 0.5 * vsz)), 6)
            AS DECIMAL(28,6)) AS lp
        FROM cbgp b JOIN ccb USING (g, w1, w2) JOIN cct USING (g, w1)
        JOIN ccv USING (g)) cj
  GROUP BY 1, 2),
cg AS (SELECT doc_id, g, n_bigrams,
    (CASE WHEN s >= 0 THEN (2 * s + 100 * n_bigrams) // (200 * n_bigrams)
          ELSE -((2 * (-s) + 100 * n_bigrams) // (200 * n_bigrams)) END)
      / 10000.0 AS lm_score
  FROM cj2),
cgm AS (SELECT doc_id, g, n_bigrams, lm_score,
    CAST(round(lm_score * 10000) AS BIGINT) AS m FROM cg),
cc AS (SELECT g, m, cnt,
    sum(cnt) OVER (PARTITION BY g ORDER BY m DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(cnt) OVER (PARTITION BY g) AS n
  FROM (SELECT g, m, count(*) AS cnt FROM cgm GROUP BY 1, 2) ch),
cthr AS (SELECT g,
    max(CASE WHEN cum >= (n * 300 + 999) // 1000 THEN m END) AS th,
    max(CASE WHEN cum >= (n * 700 + 999) // 1000 THEN m END) AS tm
  FROM cc GROUP BY g)"""

  /**
   * Mirrors `CorpusPipeline.qualityStack` (curate_quality_stack): the
   * four gates composed — the full LR descent chain scored over ALL
   * gram-bearing documents (trainBuckets = 0 serving), the corpus-LM
   * perplexity triage (the [[lmPerplexityBuckets]] histogram chain),
   * the Gopher battery (nested [[gopherQuality]] subquery), and a
   * single-line C4 page gate with the stack's parameters — LEFT-joined
   * back to every document with the engine's null semantics (a
   * document invisible to a model gate fails it; its bucket reads
   * `none`).
   */
  def qualityStack(buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0, minLineWords: Int = 3,
      minSentences: Int = 1): String =
    s"""WITH ${lrChain(buckets, iters, step)},
$lmScoreCtes,
qsz AS MATERIALIZED (
  SELECT f.doc_id, sum(CAST(coalesce(w.w, 0) AS DECIMAL(28,6))) AS zsum
  FROM qlf f LEFT JOIN (SELECT * FROM qlw$iters WHERE cell >= 0) w USING (cell)
  GROUP BY 1),
qsl AS MATERIALIZED (
  SELECT z.doc_id,
    CAST(CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
        + exp(-(CAST(b.w AS DOUBLE) + CAST(z.zsum AS DOUBLE)))), 6)
      AS DECIMAL(18,6)) AS DOUBLE) AS lr_prob
  FROM qsz z CROSS JOIN (SELECT w FROM qlw$iters WHERE cell = -1) b),
qsg AS (SELECT doc_id, CAST(round(lm_score * 10000) AS BIGINT) AS m FROM sc),
qsh AS (SELECT m, count(*) AS cnt FROM qsg GROUP BY m),
qscm AS (SELECT m,
        sum(cnt) OVER (ORDER BY m DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n
      FROM qsh),
qsthr AS (SELECT
    max(CASE WHEN cum >= (n * 300 + 999) // 1000 THEN m END) AS th,
    max(CASE WHEN cum >= (n * 700 + 999) // 1000 THEN m END) AS tm
  FROM qscm),
qsp AS (SELECT doc_id,
    CASE WHEN m >= th THEN 'head'
         WHEN m >= tm THEN 'middle' ELSE 'tail' END AS bucket
  FROM qsg CROSS JOIN qsthr),
qsgo AS ($gopherQuality),
qsc4 AS (${c4GateSql(minLineWords, minSentences)})
SELECT d.doc_id, g.gopher_pass, c.c4_pass, l.lr_prob,
  coalesce(p.bucket, 'none') AS ppl_bucket,
  (coalesce(g.gopher_pass, false) AND coalesce(c.c4_pass, false)
    AND coalesce(l.lr_prob >= 0.5, false)
    AND coalesce(p.bucket IN ('head', 'middle'), false)) AS keep
FROM documents d
LEFT JOIN qsgo g USING (doc_id)
LEFT JOIN qsc4 c USING (doc_id)
LEFT JOIN qsl l USING (doc_id)
LEFT JOIN qsp p USING (doc_id)
ORDER BY d.doc_id"""

  /** The single-line C4 page gate shared by [[qualityStack]] and
    * [[qualityStackMultilingual]]: ends in a relation shape
    * `(doc_id, c4_pass)`. */
  private def c4GateSql(minLineWords: Int, minSentences: Int): String =
    s"""
  SELECT doc_id,
    (CAST(length(cl) - length(regexp_replace(cl, '[.!?]', '', 'g'))
       AS BIGINT) >= $minSentences
      AND NOT contains(lower(text), 'lorem ipsum')
      AND NOT contains(text, '{')) AS c4_pass
  FROM (SELECT doc_id, text,
          coalesce(array_to_string(
            list_filter(string_split(text, chr(10)), l ->
              regexp_matches(trim(l), '[.!?"]$$')
              AND len(list_filter(string_split_regex(trim(l), '\\s+'),
                x -> x <> '')) >= $minLineWords
              AND NOT contains(lower(trim(l)), 'javascript')),
            chr(10)), '') AS cl
        FROM documents) q"""

  /**
   * Mirrors `CorpusPipeline.qualityStackMultilingual`
   * (curate_quality_stack_multilingual): the per-language stack — the
   * LR descent ([[lrChain]]) served over all gram-bearing documents,
   * the softmax langid descent ([[softmaxChain]]) + CCNet serve chain
   * ([[ccnetServeCtes]]) for routing and the per-language LM triage,
   * a SECOND per-group quantile cut over the LR probability
   * (micro-unit histogram partitioned by predicted language — the
   * engine's `bucketsByScorePerGroup` on `lr_prob`), and the
   * language-agnostic Gopher/C4 rule gates, LEFT-joined with the
   * stack's null semantics.
   */
  def qualityStackMultilingual(buckets: Int = 256, lrIters: Int = 24,
      smIters: Int = 12, step: Double = 3.0, minLineWords: Int = 3,
      minSentences: Int = 1): String =
    s"""WITH ${lrChain(buckets, lrIters, step)},
${softmaxChain(buckets, smIters, step)},
${ccnetServeCtes(smIters)},
mqz AS MATERIALIZED (
  SELECT f.doc_id, sum(CAST(coalesce(w.w, 0) AS DECIMAL(28,6))) AS zsum
  FROM qlf f LEFT JOIN (SELECT * FROM qlw$lrIters WHERE cell >= 0) w USING (cell)
  GROUP BY 1),
mql AS MATERIALIZED (
  SELECT z.doc_id,
    CAST(CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
        + exp(-(CAST(b.w AS DOUBLE) + CAST(z.zsum AS DOUBLE)))), 6)
      AS DECIMAL(18,6)) AS DOUBLE) AS lr_prob
  FROM mqz z CROSS JOIN (SELECT w FROM qlw$lrIters WHERE cell = -1) b),
mqm AS (SELECT l.doc_id, p.g, CAST(round(l.lr_prob * 10000) AS BIGINT) AS m
  FROM mql l JOIN cpred p USING (doc_id)),
mqc AS (SELECT g, m, cnt,
    sum(cnt) OVER (PARTITION BY g ORDER BY m DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(cnt) OVER (PARTITION BY g) AS n
  FROM (SELECT g, m, count(*) AS cnt FROM mqm GROUP BY 1, 2) mqh),
mqthr AS (SELECT g,
    max(CASE WHEN cum >= (n * 300 + 999) // 1000 THEN m END) AS th,
    max(CASE WHEN cum >= (n * 700 + 999) // 1000 THEN m END) AS tm
  FROM mqc GROUP BY g),
mqlb AS (SELECT doc_id,
    CASE WHEN m >= th THEN 'head' WHEN m >= tm THEN 'middle'
         ELSE 'tail' END AS lr_bucket
  FROM mqm JOIN mqthr USING (g)),
mqpl AS (SELECT doc_id,
    CASE WHEN m >= th THEN 'head' WHEN m >= tm THEN 'middle'
         ELSE 'tail' END AS ppl_bucket
  FROM cgm JOIN cthr USING (g)),
mqgo AS ($gopherQuality),
mqc4 AS (${c4GateSql(minLineWords, minSentences)})
SELECT d.doc_id,
  coalesce(p.g, 'none') AS pred_lang,
  g.gopher_pass, c.c4_pass, l.lr_prob,
  coalesce(lb.lr_bucket, 'none') AS lr_bucket,
  coalesce(pb.ppl_bucket, 'none') AS ppl_bucket,
  (coalesce(g.gopher_pass, false) AND coalesce(c.c4_pass, false)
    AND coalesce(lb.lr_bucket IN ('head', 'middle'), false)
    AND coalesce(pb.ppl_bucket IN ('head', 'middle'), false)) AS keep
FROM documents d
LEFT JOIN cpred p USING (doc_id)
LEFT JOIN mqgo g USING (doc_id)
LEFT JOIN mqc4 c USING (doc_id)
LEFT JOIN mql l USING (doc_id)
LEFT JOIN mqlb lb USING (doc_id)
LEFT JOIN mqpl pb USING (doc_id)
ORDER BY d.doc_id"""

  /** Mirrors `CorpusPipeline.qualityReport` over the stack (the
    * curate_quality_report query): per-(lang, source) gate pass counts
    * and kept fraction — the full [[qualityStack]] chain as a subquery,
    * then one conditional aggregation. */
  def qualityReportMart(buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0, minLineWords: Int = 3,
      minSentences: Int = 1): String = s"""WITH qsr AS MATERIALIZED (
SELECT * FROM (${qualityStack(buckets, iters, step, minLineWords,
      minSentences)}) qsr0)
SELECT d.lang, d.source, count(*) AS n_docs,
  CAST(sum(CASE WHEN r.gopher_pass THEN 1 ELSE 0 END) AS BIGINT)
    AS gopher_pass_n,
  CAST(sum(CASE WHEN r.c4_pass THEN 1 ELSE 0 END) AS BIGINT) AS c4_pass_n,
  CAST(sum(CASE WHEN r.lr_prob >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
    AS lr_pass_n,
  CAST(sum(CASE WHEN r.ppl_bucket IN ('head', 'middle') THEN 1 ELSE 0 END)
    AS BIGINT) AS ppl_pass_n,
  CAST(sum(CASE WHEN r.keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_n,
  round(CAST(sum(CASE WHEN r.keep THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) AS kept_frac
FROM qsr r JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2"""
}
