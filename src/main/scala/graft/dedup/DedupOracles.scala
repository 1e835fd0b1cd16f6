package graft.dedup

/** DuckDB oracle SQL mirroring [[TextDedup]] (shared md5-prefix hash, same
  * permutation/banding arithmetic — verified value-identical to Spark's
  * `conv(substr(md5(x),1,15),16,10)`). */
object DedupOracles {

  private val toks =
    raw"""list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"""

  /** 3-gram shingle list (distinct), empty-safe, over any
    * (doc_id, text) relation. */
  private def shCteFrom(rel: String): String =
    raw"""t AS (SELECT doc_id, $toks AS toks FROM $rel),
sh AS (SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                 for i in range(1, len(toks) - 1)])
              ELSE [] END AS s
       FROM t)"""

  private val shCte = shCteFrom("documents")

  private def hashOf(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT) % 1000000007"

  val exact: String = """SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper_id
FROM documents GROUP BY 1 ORDER BY 1"""

  /** Mirrors TextDedup.softDedupWeights: per document, its exact-dup
    * multiplicity and the 1/n sampling weight (Muennighoff
    * repeat-weighting). */
  val softWeights: String = """WITH g AS (
  SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1)
SELECT d.doc_id, g.n AS n_copies,
  round(CAST(1.0 AS DOUBLE) / g.n, 6) AS weight
FROM documents d JOIN g ON md5(d.text) = g.h
ORDER BY d.doc_id"""

  /** Replay of `Sampling.byWeight` over the soft-dedup weights: keep
    * doc iff md5-bucket(doc_id) < max(floor(weight · 10⁴), 1 for
    * positive weight) — in expectation one surviving copy per
    * duplicate group, never a deterministic drop of content (the ≥ 1
    * clamp is what keeps sub-10⁻⁴ weights alive — round-14 advice).
    * Testdata documents are all-distinct at the gate SF, so the
    * corpus plants one extra copy of every 5th doc (re-keyed +10000)
    * to exercise sub-1.0 weights. */
  val softSample: String = """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0),
g AS (SELECT md5(text) AS h, count(*) AS n FROM corpus GROUP BY 1),
w AS (SELECT d.doc_id, g.n AS n_copies,
    round(CAST(1.0 AS DOUBLE) / g.n, 6) AS weight
  FROM corpus d JOIN g ON md5(d.text) = g.h)
SELECT doc_id, n_copies, weight FROM w
WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
    AS BIGINT) % 10000 AS BIGINT)
  < greatest(CAST(floor(weight * 10000) AS BIGINT),
             CASE WHEN weight > 0 THEN 1 ELSE 0 END)
ORDER BY doc_id"""

  /** [[softWeights]] over the post-deletion survivor corpus — the gate
    * for the tombstone-epoch deletion path: weights served from grown
    * partials + a negative-count compensation epoch must equal a batch
    * recompute over the survivors alone. */
  val softWeightsSurvivors: String = """WITH surv AS (
  SELECT * FROM documents WHERE doc_id % 7 <> 0),
g AS (SELECT md5(text) AS h, count(*) AS n FROM surv GROUP BY 1)
SELECT d.doc_id, g.n AS n_copies,
  round(CAST(1.0 AS DOUBLE) / g.n, 6) AS weight
FROM surv d JOIN g ON md5(d.text) = g.h
ORDER BY d.doc_id"""

  /** Exact dedup over the canonicalized key — the normalize_text chain
    * (NFC → lower → Java-\s collapse → trim) applied before the digest.
    * The class is explicit because RE2's \s lacks \v (Java's has it). */
  val exactNormalized: String =
    raw"""SELECT md5(trim(regexp_replace(lower(nfc_normalize(text)),
        '[ \t\n\r\f\x0b]+', ' ', 'g'))) AS text_hash,
  count(*) AS n_copies, min(doc_id) AS keeper_id
FROM documents GROUP BY 1 ORDER BY 1"""

  /** Inverted index + stop-shingle keep-list, mirroring the engine's
    * document-frequency cap (df ≤ max(100, ceil(0.01·ndocs))): candidate
    * pairs must share at least one KEPT shingle, exactly as
    * `TextDedup.ngramJaccardPairs`/`contaminationPairs` cap the self-join
    * fan-out — similarity is still computed on the FULL shingle sets. */
  private val invKeepCtes = """inv AS (SELECT doc_id, unnest(hs) AS h FROM hsh),
keep AS (SELECT h FROM inv GROUP BY h
         HAVING count(*) <= greatest(100,
           CAST(ceil(0.01 * (SELECT count(*) FROM hsh)) AS BIGINT)))"""

  /** Jaccard over HASHED shingle sets (same md5-based hash as Spark, so
    * any collision is identical on both engines); candidates generated
    * through the df-capped inverted index like the engine. */
  val ngramPairs: String = s"""WITH $shCte,
hsh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM sh),
$invKeepCtes,
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM inv a JOIN keep k ON a.h = k.h JOIN inv b ON b.h = a.h
         WHERE a.doc_id < b.doc_id),
p AS (SELECT c.doc_a, c.doc_b,
        CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
      FROM cand c
      JOIN hsh sa ON sa.doc_id = c.doc_a
      JOIN hsh sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"""

  /** Shared CTE chain for contamination: benchmark docs (every 10th doc,
    * id % 10 = 3), df-capped corpus inverted index, candidate (doc, bench)
    * pairs sharing a kept shingle, and exact containment
    * |∩| / |bench shingles| over the full hashed-shingle sets. */
  private val contaminationCtes = s"""$shCte,
hsh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM sh),
bh AS (SELECT doc_id AS bench_id, hs AS bhs FROM hsh
       WHERE doc_id % 10 = 3 AND len(hs) > 0),
$invKeepCtes,
invb AS (SELECT bench_id, unnest(bhs) AS h FROM bh),
cand AS (SELECT DISTINCT a.doc_id, b.bench_id
         FROM inv a JOIN keep k ON a.h = k.h JOIN invb b ON b.h = a.h
         WHERE a.doc_id <> b.bench_id),
cont AS (SELECT c.doc_id, c.bench_id,
           CAST(len(list_intersect(sa.hs, sb.bhs)) AS DOUBLE) / len(sb.bhs)
             AS containment
         FROM cand c
         JOIN hsh sa ON sa.doc_id = c.doc_id
         JOIN bh sb ON sb.bench_id = c.bench_id)"""

  /** Cross-corpus contamination pairs at containment ≥ 0.8. */
  val contaminationPairs: String = s"""WITH $contaminationCtes
SELECT doc_id, bench_id, containment FROM cont
WHERE containment >= 0.8 ORDER BY doc_id, bench_id"""

  /** Mirrors `decontaminate_report`: per-bench-item leak counts over
    * the same contamination CTEs. */
  val contaminationReport: String = s"""WITH $contaminationCtes
SELECT bench_id, count(*) AS n_contaminated,
  round(max(containment), 6) AS max_containment,
  min(doc_id) AS first_doc
FROM cont WHERE containment >= 0.8
GROUP BY bench_id ORDER BY bench_id"""

  /** Decontaminated corpus: every doc id not contaminated above. */
  val decontaminatedCorpus: String = s"""WITH $contaminationCtes,
bad AS (SELECT DISTINCT doc_id FROM cont WHERE containment >= 0.8)
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY doc_id"""

  /** Gopher-style repetition quality signals, mirroring the
    * quality_repetition query (same hashed-shingle distinct count). */
  val qualityRepetition: String = s"""WITH $shCte,
hsh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM sh),
lns AS (SELECT doc_id,
          list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS ls
        FROM documents)
SELECT t.doc_id,
  len(ls) AS n_lines,
  round(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / nullif(len(ls), 0), 6)
    AS dup_line_frac,
  round(1.0 - CAST(len(hs) AS DOUBLE) /
    nullif(greatest(len(toks) - 2, 0), 0), 6) AS dup_3gram_frac,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) /
    nullif(len(toks), 0), 6) AS mean_word_len
FROM t JOIN hsh USING (doc_id) JOIN lns USING (doc_id)
ORDER BY t.doc_id"""

  /** minhash value for permutation i over the hs list column. */
  private def mh(i: Int): String =
    s"list_min(list_transform(hs, h -> ((${2 * i + 1} * h + ${i * i + 7}) % 1000000007)))"

  /** band signature b = join of 4 minhash values. */
  private def bandSig(b: Int): String =
    (0 until 4).map(r => s"CAST(${mh(4 * b + r)} AS VARCHAR)")
      .mkString(" || '-' || ")

  val minhashLshPairs: String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT doc_id, $b AS band_id, ${bandSig(b)} AS band_sig FROM sig")
      .mkString("\nUNION ALL\n")
    s"""WITH $shCte,
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
sig AS (SELECT doc_id, s, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM shf),
bands AS (
$bandSelects),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id),
v AS (SELECT c.doc_a, c.doc_b,
        CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"""
  }

  /** Mirrors TextDedup.dedupAgainstCorpus with batch = (doc_id % 10 = 7),
    * corpus = rest: batch survivors after exact-digest and banded
    * MinHash near-dup checks against the corpus. */
  val incrementalDedup: String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT doc_id, $b AS band_id, ${bandSig(b)} AS band_sig FROM sig")
      .mkString("\nUNION ALL\n")
    s"""WITH $shCte,
hsh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM sh),
sig AS (SELECT doc_id, hs FROM hsh WHERE len(hs) > 0),
bb AS (SELECT doc_id, md5(text) AS dg FROM documents WHERE doc_id % 10 = 7),
cc AS (SELECT doc_id, md5(text) AS dg FROM documents WHERE doc_id % 10 <> 7),
exact_dup AS (SELECT DISTINCT bb.doc_id FROM bb JOIN cc ON bb.dg = cc.dg),
bands AS (
$bandSelects),
cand AS (SELECT DISTINCT a.doc_id AS bid, b.doc_id AS cid
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_sig = b.band_sig
          AND a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7),
near_dup AS (SELECT DISTINCT c.bid AS doc_id
  FROM cand c
  JOIN hsh sa ON sa.doc_id = c.bid
  JOIN hsh sb ON sb.doc_id = c.cid
  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
        (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.8)
SELECT doc_id FROM documents WHERE doc_id % 10 = 7
  AND doc_id NOT IN (SELECT doc_id FROM exact_dup)
  AND doc_id NOT IN (SELECT doc_id FROM near_dup)
ORDER BY doc_id"""
  }

  /** Connected components of the MinHash near-dup graph via a recursive
    * reachability CTE; component = min reachable doc id. */
  val components: String = s"""WITH RECURSIVE
pairs AS ($minhashLshPairs),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node, min(comp) AS component, min(comp) = node AS is_keeper
FROM walk GROUP BY node ORDER BY node"""

  /** Keeper-only corpus: the dedup end state — one representative
    * (min doc id) per near-duplicate component. */
  val corpusKeepers: String =
    s"""SELECT node AS doc_id FROM ($components) WHERE is_keeper ORDER BY doc_id"""

  /** Mirrors TextDedup.keepersByQuality with quality = token count:
    * per component keep the LONGEST member, ties → smallest id. */
  val keepLongest: String = s"""WITH RECURSIVE
pairs AS ($minhashLshPairs),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node),
comps AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
scored AS (
  SELECT c.component, d.doc_id, CAST(len($toks) AS BIGINT) AS q
  FROM comps c JOIN documents d ON d.doc_id = c.node)
SELECT doc_id FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY component ORDER BY q DESC, doc_id) AS rn
  FROM scored) t
WHERE rn = 1 ORDER BY doc_id"""

  /** CTE chain for CorpusPipeline.keepers (stages 1-3: quality floor →
    * exact dedup → MinHash component keepers), ending in a relation
    * `keepers(doc_id, lang, text, toks)` — the shared prefix of both
    * end-to-end pipeline oracles. Callers prepend `WITH RECURSIVE`. */
  private val shingleList = raw"""CASE WHEN len(toks) >= 3
               THEN list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in range(1, len(toks) - 1)])
               ELSE [] END"""

  private val keeperCtes: String = keeperCtesFrom("documents")

  /** [[keeperCtes]] with the source relation parametrized — the curated
    * pipeline feeds the chain from a domain-gated subset. */
  private def keeperCtesFrom(src: String): String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT doc_id, $b AS band_id, ${bandSig(b)} AS band_sig FROM sig")
      .mkString("\nUNION ALL\n")
    s"""t0 AS (SELECT doc_id, lang, text, $toks AS toks FROM $src),
q AS (SELECT * FROM t0 WHERE len(toks) >= 10),
ex AS (SELECT q.* FROM q
       JOIN (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)) kx
         ON q.doc_id = kx.doc_id),
shx AS (SELECT doc_id, $shingleList AS s FROM ex),
hsh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM shx),
sig AS (SELECT doc_id, hs FROM hsh WHERE len(hs) > 0),
bands AS (
$bandSelects),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id),
prs AS (SELECT c.doc_a, c.doc_b
        FROM cand c JOIN hsh sa ON sa.doc_id = c.doc_a
        JOIN hsh sb ON sb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
              (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.8),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM prs
       UNION SELECT doc_b, doc_a FROM prs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM ex
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node),
comps AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
keepers AS (SELECT ex.* FROM ex JOIN comps ON ex.doc_id = comps.node
            WHERE comps.component = ex.doc_id)"""
  }

  /** CTE chain + final SELECT for CorpusPipeline.finishFromKeepers
    * (stages 4-6: decontamination → mixture → packing) over the keeper
    * relation named `rel` — the shared suffix of both end-to-end
    * pipeline oracles (bench = doc_id%10=3, df-capped decontamination
    * at 0.8, mixture en 0.5/de 0.3/fr 0.2 at 50%, budget 512). */
  /** CTE chain through the `mixed` relation (decontamination →
    * mixture) over keeper relation `rel` — the shared prefix of the
    * packing-suffixed [[finishCtes]] and the epoch-weighted pipeline
    * oracle. */
  private def mixedCtes(rel: String): String =
    s"""hk AS (SELECT h.doc_id, h.hs FROM hsh h JOIN $rel k ON h.doc_id = k.doc_id),
bt AS (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id % 10 = 3),
bsh AS (SELECT doc_id, $shingleList AS s FROM bt),
bhf AS (SELECT doc_id AS bench_id, bhs FROM
          (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS bhs FROM bsh)
        WHERE len(bhs) > 0),
inv AS (SELECT doc_id, unnest(hs) AS h FROM hk),
keepl AS (SELECT h FROM inv GROUP BY h
          HAVING count(*) <= greatest(100,
            CAST(ceil(0.01 * (SELECT count(*) FROM $rel)) AS BIGINT))),
invb AS (SELECT bench_id, unnest(bhs) AS h FROM bhf),
ccand AS (SELECT DISTINCT a.doc_id, b.bench_id
          FROM inv a JOIN keepl kk ON a.h = kk.h JOIN invb b ON b.h = a.h
          WHERE a.doc_id <> b.bench_id),
bad AS (SELECT DISTINCT c.doc_id
        FROM ccand c JOIN hk sa ON sa.doc_id = c.doc_id
        JOIN bhf sb ON sb.bench_id = c.bench_id
        WHERE CAST(len(list_intersect(sa.hs, sb.bhs)) AS DOUBLE) / len(sb.bhs) >= 0.8),
decon AS (SELECT * FROM $rel WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
cnts AS (SELECT lang AS cls, count(*) AS cn FROM decon GROUP BY 1),
tot AS (SELECT count(*) AS total FROM decon),
rated AS (SELECT d.doc_id, d.lang, d.toks,
            least(1.0, 0.5 * total *
              (CASE d.lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3
                           WHEN 'fr' THEN 0.2 ELSE 0.0 END) / cn) AS rate
          FROM decon d JOIN cnts ON d.lang = cnts.cls CROSS JOIN tot),
mixed AS (SELECT doc_id, lang, toks FROM rated
          WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS BIGINT)
                < greatest(CAST(floor(rate * 10000) AS BIGINT),
                           CASE WHEN rate > 0 THEN 1 ELSE 0 END))"""

  private def finishCtes(rel: String): String =
    s"""${mixedCtes(rel)},
pk AS (SELECT doc_id, lang AS shard, CAST(len(toks) AS BIGINT) AS n_tokens FROM mixed),
pp AS (SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
       FROM pk)
SELECT doc_id, shard, n_tokens,
  CAST(start_tok // 512 AS BIGINT) AS seq_id,
  CAST(start_tok % 512 AS BIGINT) AS seq_offset,
  start_tok % 512 + n_tokens > 512 AS spans_boundary
FROM pp ORDER BY doc_id"""

  /** Mirrors CorpusPipeline.prepare end-to-end (minTokens=10, MinHash
    * dedup at 0.8, then the finishCtes stages): the WHOLE corpus-prep
    * chain composed as one SQL query, so the oracle checks the
    * composition, not just the stages. */
  val corpusPipeline: String =
    s"""WITH RECURSIVE $keeperCtes,
${finishCtes("keepers")}"""

  /** Mirrors `corpus_pipeline_curated` — CorpusPipeline.curatedKeepers:
    * the synthesized crawl-URL domain gate (blocklist + suffix) and the
    * md5-rank per-domain cap (15) run BEFORE the quality/dedup keeper
    * chain, which then reads the curated subset. */
  val corpusPipelineCurated: String = raw"""WITH RECURSIVE cu AS (
  SELECT doc_id,
    'https://www.' || source || '-' || CAST(doc_id % 5 AS VARCHAR)
      || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
cd AS (
  SELECT doc_id,
    lower(regexp_replace(regexp_extract(url, '://([^/?#]+)', 1),
      '^www\.', '')) AS domain
  FROM cu),
cf AS (
  SELECT doc_id, domain FROM cd
  WHERE domain NOT IN ('src0-0.example.com', 'src7-3.example.com',
                       'src15-2.example.com')
    AND ends_with(domain, '.example.com')),
crk AS (
  SELECT doc_id,
    row_number() OVER (PARTITION BY domain ORDER BY
      CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        AS BIGINT) % 10000 AS BIGINT), doc_id) AS rn
  FROM cf),
cur AS (
  SELECT d2.* FROM documents d2
  JOIN crk ON crk.doc_id = d2.doc_id WHERE crk.rn <= 15),
""" + s"""${keeperCtesFrom("cur")}
SELECT doc_id FROM keepers ORDER BY doc_id"""

  /** Mirrors the corpus_pipeline_full query — CorpusPipeline.prepare
    * with the SEMANTIC stage spliced in between dedup and
    * decontamination: text keepers ∩ SemDeDup survivors feed the
    * decontamination → mixture → packing suffix. ONE query spanning
    * both tables checks the six-stage composition. */
  val corpusPipelineFull: String =
    s"""WITH RECURSIVE $keeperCtes,
semmem AS (SELECT doc_id AS vec_id FROM keepers),
${graft.text.TextOracles.semdedupKeeperIdCtes(threshold = 0.35)},
skeepers AS (SELECT k.* FROM keepers k
             JOIN semkeep s ON k.doc_id = s.vec_id),
${finishCtes("skeepers")}"""

  /** Mirrors corpus_pipeline_weighted: stages 1-5 (quality → exact →
    * MinHash keepers → decontamination → mixture) with fractional
    * EPOCH WEIGHTING applied to the mixed stream
    * (Sampling.repeatByFactor, en ×1.5 / de ×2.0 / fr ×1.0): ⌊f⌋
    * copies per surviving doc plus a hash-gated extra, copy index
    * emitted — the repeated stream a trainer consumes when sources
    * are weighted above one epoch. */
  val corpusPipelineWeighted: String = s"""WITH RECURSIVE $keeperCtes,
${mixedCtes("keepers")},
wf AS (SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 1.5 WHEN 'de' THEN 2.0
                   WHEN 'fr' THEN 1.0 ELSE 1.0 END AS f
       FROM mixed),
wrep AS (SELECT doc_id, lang,
           CAST(floor(f) AS BIGINT) +
           (CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS BIGINT)
                      < CAST(floor((f - floor(f)) * 10000) AS BIGINT)
                 THEN 1 ELSE 0 END) AS reps
         FROM wf)
SELECT doc_id, lang, rep FROM wrep, unnest(range(0, reps)) AS t(rep)
WHERE reps > 0 ORDER BY doc_id, rep"""

  /** Mirrors the corpus_pipeline_semantic query — stages 1-3 of
    * CorpusPipeline (quality → exact dedup → MinHash component
    * keepers) composed with the SEMANTIC dedup stage
    * (CorpusPipeline.semanticKeepers): the surviving docs' embeddings
    * are SemDeDup'ed (full-corpus seed centroids, members-only cluster
    * cap, farthest-from-centroid keeper rule) and the corpus keeps the
    * intersection. One SQL query spanning BOTH tables checks the whole
    * composition. */
  val corpusPipelineSemantic: String =
    s"""WITH RECURSIVE $keeperCtes,
semmem AS (SELECT doc_id AS vec_id FROM keepers),
${graft.text.TextOracles.semdedupKeeperIdCtes(threshold = 0.35)}
SELECT k.doc_id, k.lang FROM keepers k
JOIN semkeep s ON k.doc_id = s.vec_id
ORDER BY k.doc_id"""

  private def simhashCteFrom(rel: String): String =
    s"""tt AS (SELECT doc_id, $toks AS toks FROM $rel),
tok AS (SELECT doc_id, ${hashOf("tk")} AS h
        FROM (SELECT doc_id, unnest(toks) AS tk FROM tt)),
bitsum AS (SELECT doc_id, r.j, sum(CASE WHEN (h >> r.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM tok, range(0, 60) r(j) GROUP BY doc_id, r.j),
sim AS (SELECT doc_id,
          CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM bitsum GROUP BY doc_id)"""

  private val simhashCte = simhashCteFrom("documents")

  val simhash: String = s"""WITH $simhashCte
SELECT doc_id, simhash FROM sim ORDER BY doc_id"""

  val simhashPairs: String = s"""WITH $simhashCte,
chunks AS (SELECT doc_id, simhash, r.c, (simhash >> (15 * r.c)) & 32767 AS chunk
           FROM sim, range(0, 4) r(c))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b
  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
ORDER BY doc_a, doc_b"""

  /** Mirrors SubstringDedup.windowPairs (stride 1): every w-token window
    * hashed with the shared md5-prefix hash, df-capped on the hash key
    * (distinct docs), pairs verified on the window STRING. */
  def substringPairs(w: Int = 20, maxPostings: Long = 1000): String =
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
w0 AS (SELECT doc_id, unnest(range(0, greatest(len(toks) - $w + 1, 0))) AS pos, toks
       FROM t),
wi AS (SELECT doc_id, pos, array_to_string(toks[pos+1:pos+$w], ' ') AS win FROM w0),
hh AS (SELECT doc_id, pos, win, ${hashOf("win")} AS h FROM wi),
keep AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM hh GROUP BY 1) t
         WHERE df <= $maxPostings),
k AS (SELECT hh.* FROM hh JOIN keep USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  count(DISTINCT a.win) AS n_shared_windows,
  min(a.pos) AS first_pos_a
FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id AND a.win = b.win
GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Mirrors SubstringDedup.excise: same window/hash/df-cap chain as
    * [[substringPairs]], ownership = min doc per distinct window STRING,
    * tokens covered by a lower-owned window removed, text rebuilt from
    * the survivors in position order (token-normalized). */
  def substringExcise(w: Int = 20, maxPostings: Long = 1000): String =
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
w0 AS (SELECT doc_id, unnest(range(0, greatest(len(toks) - $w + 1, 0))) AS pos, toks
       FROM t),
wi AS (SELECT doc_id, pos, array_to_string(toks[pos+1:pos+$w], ' ') AS win FROM w0),
hh AS (SELECT doc_id, pos, win, ${hashOf("win")} AS h FROM wi),
keep AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM hh GROUP BY 1) t
         WHERE df <= $maxPostings),
k AS (SELECT hh.* FROM hh JOIN keep USING (h)),
own AS (SELECT h, win, min(doc_id) AS min_doc FROM k GROUP BY 1, 2),
mo AS (SELECT k.doc_id, k.pos FROM k
       JOIN own ON k.h = own.h AND k.win = own.win
       WHERE own.min_doc < k.doc_id),
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + $w)) AS ti FROM mo),
tp AS (SELECT doc_id, unnest(range(0, len(toks))) AS ti, unnest(toks) AS tok
       FROM t),
keptt AS (SELECT tp.doc_id, tp.ti, tp.tok FROM tp
          LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.ti = tp.ti
          WHERE cov.doc_id IS NULL),
reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text_excised
        FROM keptt GROUP BY 1),
rem AS (SELECT doc_id, count(*) AS n_tokens_removed FROM cov GROUP BY 1)
SELECT t.doc_id,
  CAST(coalesce(rem.n_tokens_removed, 0) AS BIGINT) AS n_tokens_removed,
  coalesce(reb.text_excised, '') AS text_excised
FROM t LEFT JOIN reb USING (doc_id) LEFT JOIN rem USING (doc_id)
ORDER BY doc_id"""

  /**
   * Shared CTE chain replaying the image-dedup fingerprint path in
   * DuckDB: syntheticBmp(0, text) pixels (16-wide, text bytes then
   * (i % 251) padding — same arithmetic the hash-green
   * `multimodal_decode_stats` oracle proved byte-exact against the REAL
   * BMP encode→parse round trip) → per-pixel luminance SUM (r+g+b,
   * integer) → Dhash.dhash64's 9×8 integer-boundary cell grid →
   * cross-multiplied gradient bits → the 64-bit hash as four 16-bit
   * chunk columns (DuckDB BIGINT is signed, so the full hash with bit
   * 63 is never materialized — chunks are what banding and Hamming
   * need anyway).
   */
  /** 16-bit chunk k of a 64-bit fingerprint built from (bit, b) rows —
    * shared by the image and audio fingerprint oracles (DuckDB BIGINT is
    * signed, so the full 64-bit value is never materialized). */
  private def chunk(k: Int): String =
    s"CAST(sum(CASE WHEN bit // 16 = $k THEN b << (bit % 16) ELSE 0 END) AS BIGINT) AS c$k"

  /** Synthetic-payload pixel CTEs (`s`, `px`) shared by the dHash and
    * pHash oracles: 16-wide raster, text bytes then (i % 251) padding,
    * per-pixel luminance SUM. */
  private val pxCtes: String = {
    def byteAt(i: String): String =
      s"CASE WHEN $i < len THEN ord(substr(text, CAST($i + 1 AS INT), 1)) ELSE CAST(($i) % 251 AS INT) END"
    s"""s AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
         CAST(greatest(1, least(64, (length(text) + 47) // 48)) AS BIGINT) AS h
  FROM documents),
px AS (
  SELECT doc_id, x, y,
    (${byteAt("3 * (y * 16 + x)")} + ${byteAt("3 * (y * 16 + x) + 1")} +
     ${byteAt("3 * (y * 16 + x) + 2")}) AS lum
  FROM s, range(0, 16) rx(x), range(0, 64) ry(y)
  WHERE y < h)"""
  }

  private val dhashCtes: String = s"""$pxCtes,
cell AS (
  SELECT doc_id, gi, gj,
    (gi * 16) // 9 AS xlo,
    least(16, greatest((gi * 16) // 9 + 1, ((gi + 1) * 16) // 9)) AS xhi,
    (gj * h) // 8 AS ylo,
    least(h, greatest((gj * h) // 8 + 1, ((gj + 1) * h) // 8)) AS yhi
  FROM s, range(0, 9) gx(gi), range(0, 8) gy(gj)),
cs AS (
  SELECT c.doc_id, c.gi, c.gj, sum(p.lum) AS sm, count(*) AS cnt
  FROM cell c JOIN px p ON p.doc_id = c.doc_id
    AND p.x >= c.xlo AND p.x < c.xhi AND p.y >= c.ylo AND p.y < c.yhi
  GROUP BY 1, 2, 3),
bits AS (
  SELECT l.doc_id, l.gj * 8 + l.gi AS bit,
    CASE WHEN r.sm * l.cnt > l.sm * r.cnt
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b
  FROM cs l JOIN cs r
    ON r.doc_id = l.doc_id AND r.gj = l.gj AND r.gi = l.gi + 1
  WHERE l.gi < 8),
fp AS (
  SELECT doc_id, ${chunk(0)}, ${chunk(1)}, ${chunk(2)}, ${chunk(3)}
  FROM bits GROUP BY 1)"""

  /** Mirrors `image_dhash`: the per-document dHash as chunk columns. */
  val imageDhash: String = s"""WITH $dhashCtes
SELECT doc_id, c0, c1, c2, c3 FROM fp ORDER BY doc_id"""

  /** Mirrors Multimodal.imageDedupPairs: distinct fingerprints (as two
    * 32-bit halves — the signed-64 workaround), single-chunk banding
    * (exact pigeonhole recall for maxDist ≤ 3, same pair set as the
    * engine's wide keys), Hamming as the sum of per-half bit_counts,
    * expansion to doc pairs. */
  def imageDedupPairs(maxDist: Int = 2): String =
    chunkPairsSql(dhashCtes, maxDist)

  /**
   * Mirrors Multimodal.videoDedupPairs over the encode(text) demo
   * payloads: sampled-frame digests (every 4th 64-byte frame — the
   * hash-green `multimodal_frames` arithmetic; ASCII corpus, so
   * character substr = byte slice), strHash'd to the engine's 8-byte
   * keys, distinct per document, then the SAME df-capped inverted
   * index + exact set-Jaccard as the ngram-pairs oracle.
   */
  private def videoPairCtes(threshold: Double): String = s"""vf AS (
  SELECT DISTINCT doc_id,
    ${hashOf("md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 64))")} AS h
  FROM documents,
    unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS t(i)
  WHERE i % 4 = 0),
vsets AS (SELECT doc_id, list(h) AS hs FROM vf GROUP BY 1),
vkeep AS (SELECT h FROM vf GROUP BY h
          HAVING count(*) <= greatest(100,
            CAST(ceil(0.01 * (SELECT count(*) FROM vsets)) AS BIGINT))),
vcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM vf a JOIN vkeep k ON a.h = k.h JOIN vf b ON b.h = a.h
          WHERE a.doc_id < b.doc_id),
vp AS (SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
           (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
           AS jaccard
       FROM vcand c
       JOIN vsets sa ON sa.doc_id = c.doc_a
       JOIN vsets sb ON sb.doc_id = c.doc_b
       WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
           (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
           >= $threshold)"""

  def videoDedupPairs(threshold: Double = 0.8): String =
    s"""WITH ${videoPairCtes(threshold)}
SELECT doc_a, doc_b, jaccard FROM vp ORDER BY doc_a, doc_b"""

  /** Mirrors `dedup_video_corpus`: the same recursive min-label walk
    * as the image/audio end states over the video near-dup graph. */
  def videoCorpus(threshold: Double = 0.8): String = s"""WITH RECURSIVE
${videoPairCtes(threshold)},
e2 AS (SELECT doc_a AS u, doc_b AS v FROM vp
       UNION SELECT doc_b, doc_a FROM vp),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node AS doc_id FROM (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node) t
WHERE comp = node ORDER BY doc_id"""

  /**
   * Shared CTE chain replaying [[graft.multimodal.Phash.phash64]] over
   * the same synthetic pixels: 32×32 integer-boundary cell grid →
   * `(sum·64) // count` cell values (floor division, non-negative — the
   * exact Java semantics) → 8×8 DCT-II against the ENGINE'S Q10 integer
   * cosine table (emitted below as 256 VALUES literals from
   * `Phash.T` — the oracle's trig IS the engine's table, not libm) →
   * 32nd-smallest-of-63 AC median as an order statistic (max over the
   * 32 smallest; no doubles anywhere — |F| ≤ 5.3e13 stays in BIGINT) →
   * strict-`>` bits with the DC slot always 0 → chunk columns.
   */
  private val phashCtes: String = {
    val n = graft.multimodal.Phash.GridN
    val tvals = graft.multimodal.Phash.T.zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map { case (t, x) => s"($u,$x,$t)" }
    }.mkString(", ")
    s"""$pxCtes,
cell32 AS (
  SELECT doc_id, gi, gj,
    (gi * 16) // $n AS xlo,
    least(16, greatest((gi * 16) // $n + 1, ((gi + 1) * 16) // $n)) AS xhi,
    (gj * h) // $n AS ylo,
    least(h, greatest((gj * h) // $n + 1, ((gj + 1) * h) // $n)) AS yhi
  FROM s, range(0, $n) gx(gi), range(0, $n) gy(gj)),
cv AS (
  SELECT c.doc_id, c.gi, c.gj, (sum(p.lum) * 64) // count(*) AS cv
  FROM cell32 c JOIN px p ON p.doc_id = c.doc_id
    AND p.x >= c.xlo AND p.x < c.xhi AND p.y >= c.ylo AND p.y < c.yhi
  GROUP BY 1, 2, 3),
tt(u, x, t) AS (VALUES $tvals),
dct AS (
  SELECT cv.doc_id, tu.u AS u, tv.u AS v, sum(tu.t * tv.t * cv.cv) AS f
  FROM cv JOIN tt tu ON tu.x = cv.gi JOIN tt tv ON tv.x = cv.gj
  GROUP BY 1, 2, 3),
med AS (
  SELECT doc_id, max(f) AS med FROM (
    SELECT doc_id, f,
      row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn
    FROM dct WHERE NOT (u = 0 AND v = 0)) q
  WHERE rn <= 32 GROUP BY doc_id),
bits AS (
  SELECT d.doc_id, d.v * 8 + d.u AS bit,
    CASE WHEN d.f > m.med THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b
  FROM dct d JOIN med m USING (doc_id)
  WHERE NOT (d.u = 0 AND d.v = 0)),
fp AS (
  SELECT doc_id, ${chunk(0)}, ${chunk(1)}, ${chunk(2)}, ${chunk(3)}
  FROM bits GROUP BY 1)"""
  }

  /** Mirrors `image_phash`: the per-document pHash as chunk columns. */
  val imagePhash: String = s"""WITH $phashCtes
SELECT doc_id, c0, c1, c2, c3 FROM fp ORDER BY doc_id"""

  /**
   * CTE chain replaying the ORIENTATION-CANONICAL pHash over the
   * planted-rotation demo corpus (`imageDihedralDemoPayloads`): every
   * 5th document's 16-wide synthetic raster, plus a planted copy
   * (doc_id + 1000000) carrying dihedral transform 1 + doc_id mod 7.
   * Both the plant and the canonicalization are FORWARD pixel remaps —
   * each base pixel lands at its destination coordinate under the
   * transform (the same D₄ maps as `graft.multimodal.Dihedral`, written
   * as CASE arms over destination formulas) — then each of an image's 8
   * re-orientations runs the full cell/DCT/median/bits chain with ITS
   * OWN width/height, and the canonical fingerprint is the
   * (c3,c2,c1,c0)-lexicographic minimum of the 8 chunk rows (unsigned
   * 64-bit min without ever materializing a signed-overflowing BIGINT).
   */
  private val dihedralPhashCtes: String = {
    val n = graft.multimodal.Phash.GridN
    val tvals = graft.multimodal.Phash.T.zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map { case (t, x) => s"($u,$x,$t)" }
    }.mkString(", ")
    def byteAt(i: String): String =
      s"CASE WHEN $i < len THEN ord(substr(text, CAST($i + 1 AS INT), 1)) ELSE CAST(($i) % 251 AS INT) END"
    // forward destination of source pixel (px, py) in a (w, h) raster
    // under transform g: x/y CASE arms index the same D₄ table the
    // engine's Dihedral object encodes
    def fwdX(g: String, w: String, h: String, px: String, py: String) =
      s"""CASE $g WHEN 0 THEN $px WHEN 1 THEN $h - 1 - $py
        WHEN 2 THEN $w - 1 - $px WHEN 3 THEN $py WHEN 4 THEN $w - 1 - $px
        WHEN 5 THEN $px WHEN 6 THEN $py ELSE $h - 1 - $py END"""
    def fwdY(g: String, w: String, h: String, px: String, py: String) =
      s"""CASE $g WHEN 0 THEN $py WHEN 1 THEN $px
        WHEN 2 THEN $h - 1 - $py WHEN 3 THEN $w - 1 - $px WHEN 4 THEN $py
        WHEN 5 THEN $h - 1 - $py WHEN 6 THEN $px ELSE $w - 1 - $px END"""
    s"""s5 AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
         CAST(greatest(1, least(64, (length(text) + 47) // 48)) AS BIGINT) AS h0
  FROM documents WHERE doc_id % 5 = 0),
px5 AS (
  SELECT doc_id, x, y,
    (${byteAt("3 * (y * 16 + x)")} + ${byteAt("3 * (y * 16 + x) + 1")} +
     ${byteAt("3 * (y * 16 + x) + 2")}) AS lum
  FROM s5, range(0, 16) rx(x), range(0, 64) ry(y)
  WHERE y < h0),
imgs AS (
  SELECT doc_id AS img_id, doc_id AS base, CAST(0 AS BIGINT) AS g FROM s5
  UNION ALL
  SELECT doc_id + 1000000, doc_id, 1 + doc_id % 7 FROM s5),
idim AS (
  SELECT i.img_id, i.base, i.g,
    CASE WHEN i.g IN (1,3,6,7) THEN s.h0 ELSE 16 END AS w,
    CASE WHEN i.g IN (1,3,6,7) THEN 16 ELSE s.h0 END AS h
  FROM imgs i JOIN s5 s ON s.doc_id = i.base),
pxi AS (
  SELECT d.img_id,
    ${fwdX("d.g", "16", "s.h0", "p.x", "p.y")} AS x,
    ${fwdY("d.g", "16", "s.h0", "p.x", "p.y")} AS y,
    p.lum
  FROM idim d JOIN s5 s ON s.doc_id = d.base
  JOIN px5 p ON p.doc_id = d.base),
udim AS (
  SELECT d.img_id, u.u,
    CASE WHEN u.u IN (1,3,6,7) THEN d.h ELSE d.w END AS w,
    CASE WHEN u.u IN (1,3,6,7) THEN d.w ELSE d.h END AS h
  FROM idim d, range(0, 8) u(u)),
pxu AS (
  SELECT d.img_id, u.u,
    ${fwdX("u.u", "d.w", "d.h", "p.x", "p.y")} AS x,
    ${fwdY("u.u", "d.w", "d.h", "p.x", "p.y")} AS y,
    p.lum
  FROM idim d JOIN pxi p ON p.img_id = d.img_id, range(0, 8) u(u)),
cellD AS (
  SELECT ud.img_id, ud.u, gx.gi, gy.gj,
    (gx.gi * ud.w) // $n AS xlo,
    least(ud.w, greatest((gx.gi * ud.w) // $n + 1, ((gx.gi + 1) * ud.w) // $n)) AS xhi,
    (gy.gj * ud.h) // $n AS ylo,
    least(ud.h, greatest((gy.gj * ud.h) // $n + 1, ((gy.gj + 1) * ud.h) // $n)) AS yhi
  FROM udim ud, range(0, $n) gx(gi), range(0, $n) gy(gj)),
cvD AS (
  SELECT c.img_id, c.u, c.gi, c.gj, (sum(p.lum) * 64) // count(*) AS cv
  FROM cellD c JOIN pxu p ON p.img_id = c.img_id AND p.u = c.u
    AND p.x >= c.xlo AND p.x < c.xhi AND p.y >= c.ylo AND p.y < c.yhi
  GROUP BY 1, 2, 3, 4),
tt(u, x, t) AS (VALUES $tvals),
dctD AS (
  SELECT cv.img_id, cv.u AS ou, tu.u AS fu, tv.u AS fv,
    sum(tu.t * tv.t * cv.cv) AS f
  FROM cvD cv JOIN tt tu ON tu.x = cv.gi JOIN tt tv ON tv.x = cv.gj
  GROUP BY 1, 2, 3, 4),
medD AS (
  SELECT img_id, ou, max(f) AS med FROM (
    SELECT img_id, ou, f,
      row_number() OVER (PARTITION BY img_id, ou ORDER BY f) AS rn
    FROM dctD WHERE NOT (fu = 0 AND fv = 0)) q
  WHERE rn <= 32 GROUP BY 1, 2),
bitsD AS (
  SELECT d.img_id, d.ou, d.fv * 8 + d.fu AS bit,
    CASE WHEN d.f > m.med THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b
  FROM dctD d JOIN medD m ON m.img_id = d.img_id AND m.ou = d.ou
  WHERE NOT (d.fu = 0 AND d.fv = 0)),
h8 AS (
  SELECT img_id, ou, ${chunk(0)}, ${chunk(1)}, ${chunk(2)}, ${chunk(3)}
  FROM bitsD GROUP BY 1, 2),
fp AS (
  SELECT img_id AS doc_id, c0, c1, c2, c3 FROM (
    SELECT img_id, c0, c1, c2, c3,
      row_number() OVER (PARTITION BY img_id
        ORDER BY c3, c2, c1, c0) AS rn
    FROM h8) q WHERE rn = 1)"""
  }

  /** Mirrors `image_phash_dihedral`: the canonical fingerprint per
    * image of the planted-rotation corpus, as chunk columns. */
  val imagePhashDihedral: String = s"""WITH $dihedralPhashCtes
SELECT doc_id, c0, c1, c2, c3 FROM fp ORDER BY doc_id"""

  /** Mirrors `dedup_image_pairs_dihedral` — the shared banded pair
    * expansion over the canonical fingerprint chain. */
  def imagePhashDihedralPairs(maxDist: Int = 2): String =
    chunkPairsSql(dihedralPhashCtes, maxDist)

  /** Mirrors Multimodal.imagePhashDedupPairs — the shared banded pair
    * expansion over the pHash fingerprint chain. */
  def imagePhashPairs(maxDist: Int = 2): String =
    chunkPairsSql(phashCtes, maxDist)

  /** Hamming-banded pair expansion over any `fp(doc_id, c0..c3)` CTE
    * chain — shared by the image and audio dedup oracles. */
  private def chunkPairsSql(fpCtes: String, maxDist: Int): String = s"""WITH $fpCtes,
fp2 AS (SELECT doc_id, c1 * 65536 + c0 AS lo, c3 * 65536 + c2 AS hi FROM fp),
d AS (SELECT DISTINCT hi, lo FROM fp2),
ch AS (SELECT hi, lo, k,
         CASE k WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS v
       FROM d, range(0, 4) r(k)),
cand AS (SELECT DISTINCT a.hi AS ahi, a.lo AS alo, b.hi AS bhi, b.lo AS blo
         FROM ch a JOIN ch b ON a.k = b.k AND a.v = b.v
           AND (a.hi < b.hi OR (a.hi = b.hi AND a.lo <= b.lo))),
hp AS (SELECT ahi, alo, bhi, blo,
         bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) AS hamming
       FROM cand
       WHERE bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) <= $maxDist)
SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
  greatest(x.doc_id, y.doc_id) AS doc_b, hamming
FROM hp JOIN fp2 x ON x.hi = hp.ahi AND x.lo = hp.alo
        JOIN fp2 y ON y.hi = hp.bhi AND y.lo = hp.blo
WHERE x.doc_id <> y.doc_id
ORDER BY doc_a, doc_b"""

  /**
   * Shared CTE chain replaying the audio-dedup fingerprint path:
   * syntheticWav(0, text) samples (the arithmetic the hash-green
   * `multimodal_audio_stats` oracle proved byte-exact against the REAL
   * RIFF encode→parse round trip, with the id salt fixed at 0) →
   * AudioFingerprint.fingerprint64's 33 integer-boundary frames →
   * per-frame energy (Σs²) and zero-crossing counts (sign flip vs the
   * previous GLOBAL sample, lag over sample order) → gain-invariant
   * mean comparisons in HUGEINT → 64-bit fingerprint as chunk columns.
   */
  private val afpCtes: String = s"""s AS (
  SELECT doc_id, text,
         CAST(least(120, strlen(coalesce(text, ''))) AS BIGINT) AS tlen,
         CAST(greatest(8, least(4096,
           least(120, strlen(coalesce(text, ''))))) AS BIGINT) AS n
  FROM documents),
smp AS (
  SELECT doc_id, n, i,
    CASE WHEN i % 97 = 0 THEN 32767
         WHEN tlen = 0 THEN (CAST(i % 251 AS INT) - 128) * 250
              + CAST(i % 17 AS INT)
         ELSE (ord(substr(text, CAST(i % tlen AS INT) + 1, 1)) - 128) * 250
              + CAST(i % 17 AS INT)
    END AS v
  FROM s, range(0, 4096) ri(i) WHERE i < n),
sm2 AS (
  SELECT doc_id, i, v,
    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM smp),
fb AS (
  SELECT doc_id, f, (f * n) // 33 AS lo,
    least(n, greatest((f * n) // 33 + 1, ((f + 1) * n) // 33)) AS hi
  FROM s, range(0, 33) rf(f)),
fe AS (
  SELECT fb.doc_id, fb.f,
    sum(CAST(p.v AS BIGINT) * p.v) AS e,
    sum(CASE WHEN p.i >= 1 AND ((p.v < 0) <> (p.pv < 0))
             THEN 1 ELSE 0 END) AS z,
    count(*) AS c
  FROM fb JOIN sm2 p
    ON p.doc_id = fb.doc_id AND p.i >= fb.lo AND p.i < fb.hi
  GROUP BY 1, 2),
tr AS (
  SELECT l.doc_id, l.f,
    CASE WHEN CAST(r.e AS HUGEINT) * l.c > CAST(l.e AS HUGEINT) * r.c
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS eb,
    CASE WHEN CAST(r.z AS HUGEINT) * l.c > CAST(l.z AS HUGEINT) * r.c
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS zb
  FROM fe l JOIN fe r ON r.doc_id = l.doc_id AND r.f = l.f + 1
  WHERE l.f < 32),
bits AS (
  SELECT doc_id, f AS bit, eb AS b FROM tr
  UNION ALL SELECT doc_id, 32 + f AS bit, zb AS b FROM tr),
fp AS (
  SELECT doc_id, ${chunk(0)}, ${chunk(1)}, ${chunk(2)}, ${chunk(3)}
  FROM bits GROUP BY 1)"""

  /** Mirrors `dedup_image_corpus`: connected components over the image
    * near-dup graph (same recursive min-label walk as [[components]]),
    * keepers only — the multimodal dedup END STATE. Documents without a
    * pair (or without a decodable payload) are their own component and
    * survive. */
  def imageCorpus(maxDist: Int = 2): String = s"""WITH RECURSIVE
pairs AS (${imageDedupPairs(maxDist)}),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node AS doc_id FROM (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node) t
WHERE comp = node ORDER BY doc_id"""

  /** Mirrors `audio_fingerprint`: per-clip envelope hash as chunks. */
  val audioFingerprint: String = s"""WITH $afpCtes
SELECT doc_id, c0, c1, c2, c3 FROM fp ORDER BY doc_id"""

  /**
   * Replays `dedup_audio_pairs_shifted` end-to-end: the SHIFTED demo
   * corpus (every doc_id ≡ 5 mod 31 becomes the PREVIOUS doc's clip
   * delayed by 32 zero samples), AudioFingerprint.windowedFingerprints
   * (64-sample windows, hop 16 — each window fingerprinted as its own
   * clip with window-local zero-crossing lag), and the banding with
   * per-pair MIN window Hamming. All window arithmetic is integer, so
   * the replay is exact.
   */
  def audioDedupPairsShifted(maxDist: Int = 2): String =
    s"""WITH ${afpShiftedCtes(maxDist)}
SELECT doc_a, doc_b, min(hamming) AS hamming FROM allp
GROUP BY 1, 2 ORDER BY doc_a, doc_b"""

  /** Mirrors `dedup_audio_corpus_shifted`: the shift-tolerant pairs →
    * the same recursive min-label component walk as [[audioCorpus]] →
    * keepers only. */
  def audioCorpusShifted(maxDist: Int = 2): String = s"""WITH RECURSIVE
${afpShiftedCtes(maxDist)},
pairs AS (SELECT doc_a, doc_b FROM allp GROUP BY 1, 2),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node AS doc_id FROM (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node) t
WHERE comp = node ORDER BY doc_id"""

  /** Mirrors `dedup_audio_pairs_aligned`: the arbitrary-offset +
    * re-encode planting (+5 zero samples / 8-bit floor), the
    * eps-255 leading/trailing silence trim, then the same windowed
    * fingerprint + banding replay — all integer. */
  def audioDedupPairsAligned(maxDist: Int = 2): String =
    s"""WITH ${afpAlignedCtes(maxDist)}
SELECT doc_a, doc_b, min(hamming) AS hamming FROM allp
GROUP BY 1, 2 ORDER BY doc_a, doc_b"""

  /** Mirrors `dedup_audio_corpus_aligned`: aligned pairs → recursive
    * min-label components → keepers. */
  def audioCorpusAligned(maxDist: Int = 2): String = s"""WITH RECURSIVE
${afpAlignedCtes(maxDist)},
pairs AS (SELECT doc_a, doc_b FROM allp GROUP BY 1, 2),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node AS doc_id FROM (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node) t
WHERE comp = node ORDER BY doc_id"""

  /** [[afpShiftedCtes]] with the aligned-kind planting and the
    * silence trim: doc ≡ 5 (mod 31) is the previous doc's clip behind
    * 5 zero samples (NON-hop-multiple), doc ≡ 9 (mod 31) the previous
    * doc's clip floored to 256-multiples (8-bit re-encode, the Scala
    * `(s >> 8) << 8` = s − mod(s, 256) with mod in [0, 256)); samples
    * with |v| ≤ 255 are trimmed from both ends before windowing. */
  private def afpAlignedCtes(maxDist: Int): String = s"""s0 AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 31 IN (5, 9) AND p.doc_id IS NOT NULL
              THEN p.text ELSE d.text END AS text,
         CASE WHEN d.doc_id % 31 = 5 AND p.doc_id IS NOT NULL
              THEN CAST(5 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS sh,
         d.doc_id % 31 = 9 AND p.doc_id IS NOT NULL AS req
  FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
s1 AS (
  SELECT doc_id, text, sh, req,
         CAST(least(120, strlen(coalesce(text, ''))) AS BIGINT) AS tlen,
         CAST(greatest(8, least(4096,
           least(120, strlen(coalesce(text, ''))))) AS BIGINT) + sh AS rawn
  FROM s0),
rsm AS (
  SELECT doc_id, rawn, i,
    CASE WHEN req THEN bv - ((bv % 256 + 256) % 256) ELSE bv END AS v
  FROM (
    SELECT doc_id, rawn, req, i,
      CASE WHEN i < sh THEN 0
           WHEN (i - sh) % 97 = 0 THEN 32767
           WHEN tlen = 0 THEN (CAST((i - sh) % 251 AS INT) - 128) * 250
                + CAST((i - sh) % 17 AS INT)
           ELSE (ord(substr(text, CAST((i - sh) % tlen AS INT) + 1, 1)) - 128)
                * 250 + CAST((i - sh) % 17 AS INT)
      END AS bv
    FROM s1, range(0, 4128) ri(i) WHERE i < rawn) rsm0),
tb AS (
  SELECT doc_id, min(i) AS i0, max(i) AS i1
  FROM rsm WHERE abs(v) > 255 GROUP BY doc_id),
smp AS (
  SELECT rsm.doc_id, tb.i1 - tb.i0 + 1 AS n, rsm.i - tb.i0 AS i, rsm.v
  FROM rsm JOIN tb USING (doc_id)
  WHERE rsm.i BETWEEN tb.i0 AND tb.i1),
s AS (SELECT doc_id, i1 - i0 + 1 AS n FROM tb),
wins AS (
  SELECT doc_id, w,
         CASE WHEN n < 64 THEN CAST(0 AS BIGINT) ELSE w * 16 END AS woff,
         CASE WHEN n < 64 THEN n ELSE CAST(64 AS BIGINT) END AS wn
  FROM s, range(0, 256) rw(w)
  WHERE (n < 64 AND w = 0) OR (n >= 64 AND w <= (n - 64) // 16)),
wsm AS (
  SELECT wins.doc_id, wins.w, smp.i - wins.woff AS j, smp.v,
    lag(smp.v) OVER (PARTITION BY wins.doc_id, wins.w ORDER BY smp.i) AS pv
  FROM wins JOIN smp ON smp.doc_id = wins.doc_id
    AND smp.i >= wins.woff AND smp.i < wins.woff + wins.wn),
fb AS (
  SELECT doc_id, w, f, (f * wn) // 33 AS lo,
    least(wn, greatest((f * wn) // 33 + 1, ((f + 1) * wn) // 33)) AS hi
  FROM wins, range(0, 33) rf(f)),
fe AS (
  SELECT fb.doc_id, fb.w, fb.f,
    sum(CAST(p.v AS BIGINT) * p.v) AS e,
    sum(CASE WHEN p.j >= 1 AND ((p.v < 0) <> (p.pv < 0))
             THEN 1 ELSE 0 END) AS z,
    count(*) AS c
  FROM fb JOIN wsm p
    ON p.doc_id = fb.doc_id AND p.w = fb.w AND p.j >= fb.lo AND p.j < fb.hi
  GROUP BY 1, 2, 3),
tr AS (
  SELECT l.doc_id, l.w, l.f,
    CASE WHEN CAST(r.e AS HUGEINT) * l.c > CAST(l.e AS HUGEINT) * r.c
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS eb,
    CASE WHEN CAST(r.z AS HUGEINT) * l.c > CAST(l.z AS HUGEINT) * r.c
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS zb
  FROM fe l JOIN fe r ON r.doc_id = l.doc_id AND r.w = l.w AND r.f = l.f + 1
  WHERE l.f < 32),
bits AS (
  SELECT doc_id, w, f AS bit, eb AS b FROM tr
  UNION ALL SELECT doc_id, w, 32 + f AS bit, zb AS b FROM tr),
fp0 AS (
  SELECT doc_id, w, ${chunk(0)}, ${chunk(1)}, ${chunk(2)}, ${chunk(3)}
  FROM bits GROUP BY 1, 2),
fp2 AS (SELECT doc_id, c1 * 65536 + c0 AS lo, c3 * 65536 + c2 AS hi FROM fp0),
d AS (SELECT DISTINCT hi, lo FROM fp2),
ch AS (SELECT hi, lo, k,
         CASE k WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS v
       FROM d, range(0, 4) r(k)),
cand AS (SELECT DISTINCT a.hi AS ahi, a.lo AS alo, b.hi AS bhi, b.lo AS blo
         FROM ch a JOIN ch b ON a.k = b.k AND a.v = b.v
           AND (a.hi < b.hi OR (a.hi = b.hi AND a.lo <= b.lo))),
hp AS (SELECT ahi, alo, bhi, blo,
         bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) AS hamming
       FROM cand
       WHERE bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) <= $maxDist),
allp AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
           greatest(x.doc_id, y.doc_id) AS doc_b, hamming
         FROM hp JOIN fp2 x ON x.hi = hp.ahi AND x.lo = hp.alo
                 JOIN fp2 y ON y.hi = hp.bhi AND y.lo = hp.blo
         WHERE x.doc_id <> y.doc_id)"""

  private def afpShiftedCtes(maxDist: Int): String = s"""s0 AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 31 = 5 AND p.doc_id IS NOT NULL
              THEN p.text ELSE d.text END AS text,
         CASE WHEN d.doc_id % 31 = 5 AND p.doc_id IS NOT NULL
              THEN CAST(32 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS sh
  FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
s AS (
  SELECT doc_id, text, sh,
         CAST(least(120, strlen(coalesce(text, ''))) AS BIGINT) AS tlen,
         CAST(greatest(8, least(4096,
           least(120, strlen(coalesce(text, ''))))) AS BIGINT) + sh AS n
  FROM s0),
smp AS (
  SELECT doc_id, n, i,
    CASE WHEN i < sh THEN 0
         WHEN (i - sh) % 97 = 0 THEN 32767
         WHEN tlen = 0 THEN (CAST((i - sh) % 251 AS INT) - 128) * 250
              + CAST((i - sh) % 17 AS INT)
         ELSE (ord(substr(text, CAST((i - sh) % tlen AS INT) + 1, 1)) - 128)
              * 250 + CAST((i - sh) % 17 AS INT)
    END AS v
  FROM s, range(0, 4128) ri(i) WHERE i < n),
wins AS (
  SELECT doc_id, w,
         CASE WHEN n < 64 THEN CAST(0 AS BIGINT) ELSE w * 16 END AS woff,
         CASE WHEN n < 64 THEN n ELSE CAST(64 AS BIGINT) END AS wn
  FROM s, range(0, 256) rw(w)
  WHERE (n < 64 AND w = 0) OR (n >= 64 AND w <= (n - 64) // 16)),
wsm AS (
  SELECT wins.doc_id, wins.w, smp.i - wins.woff AS j, smp.v,
    lag(smp.v) OVER (PARTITION BY wins.doc_id, wins.w ORDER BY smp.i) AS pv
  FROM wins JOIN smp ON smp.doc_id = wins.doc_id
    AND smp.i >= wins.woff AND smp.i < wins.woff + wins.wn),
fb AS (
  SELECT doc_id, w, f, (f * wn) // 33 AS lo,
    least(wn, greatest((f * wn) // 33 + 1, ((f + 1) * wn) // 33)) AS hi
  FROM wins, range(0, 33) rf(f)),
fe AS (
  SELECT fb.doc_id, fb.w, fb.f,
    sum(CAST(p.v AS BIGINT) * p.v) AS e,
    sum(CASE WHEN p.j >= 1 AND ((p.v < 0) <> (p.pv < 0))
             THEN 1 ELSE 0 END) AS z,
    count(*) AS c
  FROM fb JOIN wsm p
    ON p.doc_id = fb.doc_id AND p.w = fb.w AND p.j >= fb.lo AND p.j < fb.hi
  GROUP BY 1, 2, 3),
tr AS (
  SELECT l.doc_id, l.w, l.f,
    CASE WHEN CAST(r.e AS HUGEINT) * l.c > CAST(l.e AS HUGEINT) * r.c
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS eb,
    CASE WHEN CAST(r.z AS HUGEINT) * l.c > CAST(l.z AS HUGEINT) * r.c
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS zb
  FROM fe l JOIN fe r ON r.doc_id = l.doc_id AND r.w = l.w AND r.f = l.f + 1
  WHERE l.f < 32),
bits AS (
  SELECT doc_id, w, f AS bit, eb AS b FROM tr
  UNION ALL SELECT doc_id, w, 32 + f AS bit, zb AS b FROM tr),
fp0 AS (
  SELECT doc_id, w, ${chunk(0)}, ${chunk(1)}, ${chunk(2)}, ${chunk(3)}
  FROM bits GROUP BY 1, 2),
fp2 AS (SELECT doc_id, c1 * 65536 + c0 AS lo, c3 * 65536 + c2 AS hi FROM fp0),
d AS (SELECT DISTINCT hi, lo FROM fp2),
ch AS (SELECT hi, lo, k,
         CASE k WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS v
       FROM d, range(0, 4) r(k)),
cand AS (SELECT DISTINCT a.hi AS ahi, a.lo AS alo, b.hi AS bhi, b.lo AS blo
         FROM ch a JOIN ch b ON a.k = b.k AND a.v = b.v
           AND (a.hi < b.hi OR (a.hi = b.hi AND a.lo <= b.lo))),
hp AS (SELECT ahi, alo, bhi, blo,
         bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) AS hamming
       FROM cand
       WHERE bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) <= $maxDist),
allp AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
           greatest(x.doc_id, y.doc_id) AS doc_b, hamming
         FROM hp JOIN fp2 x ON x.hi = hp.ahi AND x.lo = hp.alo
                 JOIN fp2 y ON y.hi = hp.bhi AND y.lo = hp.blo
         WHERE x.doc_id <> y.doc_id)"""

  /** Mirrors Multimodal.audioDedupPairs. */
  def audioDedupPairs(maxDist: Int = 2): String =
    chunkPairsSql(afpCtes, maxDist)

  /** Mirrors `dedup_multimodal_corpus`: ONE keeper set from the union
    * of near-dup evidence across all three modalities — text MinHash
    * pairs ∪ image dHash pairs ∪ audio envelope pairs feed a single
    * connected-components walk. A document is removed when ANY modality
    * ties it (transitively) to a lower-id document — the cross-modal
    * closure a real multimodal training pipeline needs (a re-encoded
    * image with fresh alt text, or copied text with re-rendered media,
    * is the SAME asset). */
  def multimodalCorpus(maxDist: Int = 2): String = s"""WITH RECURSIVE
tp AS ($minhashLshPairs),
ip AS (${imageDedupPairs(maxDist)}),
ap AS (${audioDedupPairs(maxDist)}),
vdp AS (${videoDedupPairs()}),
pairs AS (SELECT doc_a, doc_b FROM tp
          UNION SELECT doc_a, doc_b FROM ip
          UNION SELECT doc_a, doc_b FROM ap
          UNION SELECT doc_a, doc_b FROM vdp),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node AS doc_id FROM (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node) t
WHERE comp = node ORDER BY doc_id"""

  /** Mirrors `dedup_audio_corpus` — [[imageCorpus]] over the audio
    * near-dup graph. */
  def audioCorpus(maxDist: Int = 2): String = s"""WITH RECURSIVE
pairs AS (${audioDedupPairs(maxDist)}),
e2 AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION SELECT doc_b, doc_a FROM pairs),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e2.u, w.comp FROM walk w JOIN e2 ON e2.v = w.node)
SELECT node AS doc_id FROM (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node) t
WHERE comp = node ORDER BY doc_id"""

  // ----------------------------------------------------- evaluation mart

  /** The planted-corpus CTEs mirroring `DedupEval.plantedCorpus` +
    * `truthPairs`: `pd(doc_id, origin, text)` and `tr(doc_a, doc_b)`.
    * Variant texts are single-space joins of the lowercased token
    * prefixes; ⌊0.8·n⌋ uses integer `//`. */
  private val evalCorpusCtes: String =
    s"""pd0 AS MATERIALIZED (SELECT text, min(doc_id) AS origin
  FROM documents GROUP BY text),
pt AS (SELECT origin, text, $toks AS tk FROM pd0),
pd AS MATERIALIZED (
  SELECT origin * 4 AS doc_id, origin, text FROM pt
  UNION ALL
  SELECT origin * 4 + 1, origin, array_to_string(tk[1:len(tk)-1], ' ')
  FROM pt WHERE len(tk) >= 2
  UNION ALL
  SELECT origin * 4 + 2, origin,
    array_to_string(tk[1:(8*len(tk))//10], ' ')
  FROM pt WHERE origin % 2 = 0 AND (8*len(tk))//10 >= 1
    AND (8*len(tk))//10 < len(tk)
  UNION ALL
  SELECT origin * 4 + 3, origin, text FROM pt WHERE origin % 3 = 0),
tr AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pd a JOIN pd b ON a.origin = b.origin AND a.doc_id < b.doc_id)"""

  /** df-capped n-gram Jaccard pairs over `pd` at `threshold` — the
    * [[ngramPairs]] chain nested as a subquery so each family keeps its
    * own CTE namespace. */
  private def evalNgramSub(threshold: Double): String =
    s"""WITH ${shCteFrom("pd")},
hsh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM sh),
$invKeepCtes,
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM inv a JOIN keep k ON a.h = k.h JOIN inv b ON b.h = a.h
         WHERE a.doc_id < b.doc_id),
p AS (SELECT c.doc_a, c.doc_b,
        CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
      FROM cand c
      JOIN hsh sa ON sa.doc_id = c.doc_a
      JOIN hsh sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b FROM p WHERE jaccard >= $threshold"""

  /** Banded MinHash-LSH pairs over `pd` at threshold 0.8 (8 bands × 4
    * rows — the [[minhashLshPairs]] chain). */
  private val evalMinhashSub: String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT doc_id, $b AS band_id, ${bandSig(b)} AS band_sig FROM sig")
      .mkString("\nUNION ALL\n")
    s"""WITH ${shCteFrom("pd")},
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
sig AS (SELECT doc_id, s, list_distinct(list_transform(s, x -> ${hashOf("x")})) AS hs FROM shf),
bands AS (
$bandSelects),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id),
v AS (SELECT c.doc_a, c.doc_b,
        CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8"""
  }

  /** Chunk-indexed SimHash pairs over `pd` at Hamming ≤ 1. */
  private val evalSimhashSub: String =
    s"""WITH ${simhashCteFrom("pd")},
chunks AS (SELECT doc_id, simhash, r.c, (simhash >> (15 * r.c)) & 32767 AS chunk
           FROM sim, range(0, 4) r(c))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM chunks a JOIN chunks b
  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1"""

  /** All families' detected pairs over `pd`, tagged — `det(family,
    * doc_a, doc_b)` — plus the family list relation. */
  private val evalDetCtes: String =
    s"""det AS MATERIALIZED (
  SELECT 'exact' AS family, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT doc_id, md5(text) AS h FROM pd) a
  JOIN (SELECT doc_id, md5(text) AS h FROM pd) b
    ON a.h = b.h AND a.doc_id < b.doc_id
  UNION ALL
  SELECT 'minhash_lsh_0.8', doc_a, doc_b FROM ($evalMinhashSub) q1
  UNION ALL
  SELECT 'ngram_jaccard_0.6', doc_a, doc_b FROM (${evalNgramSub(0.6)}) q2
  UNION ALL
  SELECT 'ngram_jaccard_0.8', doc_a, doc_b FROM (${evalNgramSub(0.8)}) q3
  UNION ALL
  SELECT 'simhash_1', doc_a, doc_b FROM ($evalSimhashSub) q4),
fams AS (SELECT unnest(['exact', 'minhash_lsh_0.8', 'ngram_jaccard_0.6',
  'ngram_jaccard_0.8', 'simhash_1']) AS family)"""

  /** Mirrors `DedupEval.evalReport` (dedup_eval_report). */
  val evalReport: String = s"""WITH $evalCorpusCtes,
$evalDetCtes,
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tr),
ag AS (SELECT family, CAST(count(*) AS BIGINT) AS n_pred,
    CAST(sum(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp
  FROM det d LEFT JOIN tr t ON d.doc_a = t.doc_a AND d.doc_b = t.doc_b
  GROUP BY family)
SELECT f.family, n.n_truth,
  CAST(coalesce(a.n_pred, 0) AS BIGINT) AS n_pred,
  CAST(coalesce(a.tp, 0) AS BIGINT) AS tp,
  CAST(coalesce(a.n_pred - a.tp, 0) AS BIGINT) AS fp,
  CAST(n.n_truth - coalesce(a.tp, 0) AS BIGINT) AS fn,
  CASE WHEN coalesce(a.n_pred, 0) = 0 THEN NULL
       ELSE round(CAST(a.tp AS DOUBLE) / a.n_pred, 4) END AS precision,
  CASE WHEN n.n_truth = 0 THEN NULL
       ELSE round(CAST(coalesce(a.tp, 0) AS DOUBLE) / n.n_truth, 4)
       END AS recall
FROM fams f CROSS JOIN ntr n LEFT JOIN ag a USING (family)
ORDER BY family"""

  /** Mirrors `DedupEval.overlapReport` (dedup_eval_overlap). */
  val evalOverlap: String = s"""WITH $evalCorpusCtes,
$evalDetCtes,
o AS (SELECT x.family AS fam_a, y.family AS fam_b,
    CAST(count(*) AS BIGINT) AS n_common
  FROM det x JOIN det y
    ON x.doc_a = y.doc_a AND x.doc_b = y.doc_b AND x.family < y.family
  GROUP BY 1, 2)
SELECT fa.family AS family_a, fb.family AS family_b,
  CAST(coalesce(o.n_common, 0) AS BIGINT) AS n_common
FROM fams fa JOIN fams fb ON fa.family < fb.family
LEFT JOIN o ON o.fam_a = fa.family AND o.fam_b = fb.family
ORDER BY family_a, family_b"""
}
