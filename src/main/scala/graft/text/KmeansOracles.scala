package graft.text

import graft.embeddings.EmbeddingOps

/**
 * DuckDB oracles that RECOMPUTE the trained ANN tiers — closing the
 * round-6 gap where `EmbeddingOps.kmeansCentroids` and
 * `ProductQuantization.trainedCodebook` were spec-verified but every
 * driver-checked query used the seed tier.
 *
 * Both trainers are bit-deterministic by construction (bounded
 * md5-ordered sample, greedy farthest-point init, sequential Lloyd
 * iterations on the driver, no RNG), so the oracle can replay them
 * EXACTLY: the generators below unroll the init steps and Lloyd
 * iterations into a CTE chain of single-row list computations whose
 * float arithmetic is the same left-to-right fold order as the Scala
 * loops (`list_reduce` over index-ordered `list_transform`s), the same
 * strict-inequality/first-wins tie rules (`CASE WHEN b.s > a.s` keeps
 * the earlier element on ties, mirroring `if (s > bestScore)`), the
 * same `max(·, 1e-12)` / `0 → 1` norm guards, and the same
 * empty-cluster keep-previous rule. No approximation, no baked-in
 * centroid literals — a testdata regeneration or a trainer rule change
 * re-derives (or loudly breaks) both sides.
 *
 * Shapes mirror `EmbeddingOps.kmeansCentroids(nlist=8, iters=10,
 * sampleSize=4096)` over raw vectors (cosine objective) and
 * `ProductQuantization.trainedCodebook(m=8, ksub=16, iters=10)` over
 * unit-normalized vectors (per-subspace squared-L2 objective).
 */
object KmeansOracles {

  /** Embedding width of the demo corpus. */
  private val D = 64
  private val SampleLimit = 4096

  // Left-to-right folds in index order — the exact shape of the Scala
  // trainers' `while` loops (and of every existing embedding oracle).
  private def dot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), zz -> zz[1] * zz[2]), (pa, pb) -> pa + pb)"
  private def l2(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), zz -> (zz[1] - zz[2]) * (zz[1] - zz[2])), (pa, pb) -> pa + pb)"
  private def gnorm(a: String): String =
    s"greatest(sqrt(${dot(a, a)}), 1e-12)"

  /** Index of the minimum of a double-list (strict `<`, first wins —
    * mirrors `if (x < best)` argmin scans). */
  private def argmin(l: String): String =
    s"(list_reduce(list_transform(range(len($l)), ai -> {'v': ($l)[ai + 1], 'j': ai}), " +
      "(aa, ab) -> CASE WHEN ab.v < aa.v THEN ab ELSE aa END)).j"

  /** Index of the maximum (strict `>`, first wins). */
  private def argmax(l: String): String =
    s"(list_reduce(list_transform(range(len($l)), ai -> {'v': ($l)[ai + 1], 'j': ai}), " +
      "(aa, ab) -> CASE WHEN ab.v > aa.v THEN ab ELSE aa END)).j"

  /**
   * CTE chain replaying `EmbeddingOps.kmeansCentroids`: md5-ordered
   * sample (raw vectors), guarded sample norms, seed 0 = first sample
   * vector, then `nlist−1` farthest-point steps (argmin of the running
   * max-cosine-to-seeds), then `iters` Lloyd steps (assign by
   * dot/centroid-norm with first-wins ties; per-cluster mean summed in
   * sample order; empty cluster keeps its previous centroid). Ends in
   * `kcents(cid, cv, cn)` — the exact rows `ivfTopK` receives as
   * centroid literals.
   */
  private[graft] def centroidChain(nlist: Int = 8, iters: Int = 10,
      src: String = "embeddings"): String = {
    val sb = new StringBuilder
    sb ++= s"""ksamp AS (
  SELECT list(v ORDER BY hk, id) AS S
  FROM (SELECT vec_id AS id, md5(CAST(vec_id AS VARCHAR)) AS hk,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM $src ORDER BY hk, id LIMIT $SampleLimit) kst),
ksn AS (SELECT S, list_transform(S, sv -> ${gnorm("sv")}) AS SN FROM ksamp),
ki0 AS (SELECT S, SN, [CAST(0 AS BIGINT)] AS seeds,
          list_transform(range(len(S)), kj -> ${dot("S[kj + 1]", "S[1]")} / (SN[kj + 1] * SN[1])) AS mc
        FROM ksn)"""
    for (s <- 1 until nlist) {
      sb ++= s""",
ki$s AS (
  SELECT S, SN, list_append(seeds, far) AS seeds,
         list_transform(range(len(S)), kj ->
           greatest(mc[kj + 1], ${dot("S[kj + 1]", "S[far + 1]")} / (SN[kj + 1] * SN[far + 1]))) AS mc
  FROM (SELECT S, SN, seeds, mc, ${argmin("mc")} AS far FROM ki${s - 1}) kt$s)"""
    }
    sb ++= s""",
kc0 AS (SELECT S, SN, list_transform(seeds, sd -> S[sd + 1]) AS C FROM ki${nlist - 1})"""
    for (it <- 1 to iters) {
      val prev = if (it == 1) "kc0" else s"kl${it - 1}"
      sb ++= s""",
kl$it AS (
  SELECT S, SN,
    list_transform(range($nlist), kc ->
      CASE WHEN len(asg[kc + 1]) = 0 THEN C[kc + 1]
           ELSE list_transform(range($D), ki ->
             list_reduce(list_transform(asg[kc + 1], av -> av[ki + 1]), (pa, pb) -> pa + pb)
               / len(asg[kc + 1])) END) AS C
  FROM (
    SELECT S, SN, C,
      list_transform(range($nlist), kc ->
        list_transform(list_filter(range(len(S)), kj -> bests[kj + 1] = kc), kj -> S[kj + 1])) AS asg
    FROM (
      SELECT S, SN, C,
        list_transform(range(len(S)), kj ->
          (list_reduce(list_transform(range($nlist), kc -> {'s': ${dot("S[kj + 1]", "C[kc + 1]")} / CN[kc + 1], 'c': kc}),
             (aa, ab) -> CASE WHEN ab.s > aa.s THEN ab ELSE aa END)).c) AS bests
      FROM (SELECT S, SN, C, list_transform(C, cv0 -> ${gnorm("cv0")}) AS CN FROM $prev) ku$it) kv$it) kw$it)"""
    }
    sb ++= s""",
kcents AS (
  SELECT CAST(kcid AS BIGINT) AS cid, C[kcid + 1] AS cv, ${gnorm("C[kcid + 1]")} AS cn
  FROM (SELECT unnest(range($nlist)) AS kcid, C FROM kl$iters) kcx)"""
    sb.toString
  }

  private val dotNC =
    "list_reduce(list_transform(list_zip(n.v, c.cv), zz -> zz[1] * zz[2]), (pa, pb) -> pa + pb)"

  /** Mirrors `ivfTopK(k=5, nlist=8, nprobe=2,
    * centroids=Some(kmeansCentroids(...)))` — the production trained
    * tier: same probe/assign/score/tie rules as the seed-tier
    * annIvfTopK oracle, against the recomputed `kcents`. */
  val annIvfTrainedTopK: String = s"""WITH ${TextOracles.normCte},
${centroidChain()},
assign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster, v AS nv, nrm AS nn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN kcents c) t WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid AS cluster, v AS qv, nrm AS qn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN kcents c WHERE n.vec_id < ${EmbeddingOps.DemoQueryCount}) t
  WHERE rn <= 2),
cand AS (
  SELECT query_id, neighbor_id,
         round(list_reduce(list_transform(list_zip(qv, nv), zz -> zz[1] * zz[2]),
               (pa, pb) -> pa + pb) / (qn * nn), 4) AS cosine
  FROM probes JOIN assign USING (cluster)
  WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rank FROM cand) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /**
   * CTE chain replaying `ProductQuantization.trainedCodebook`: the
   * md5-ordered sample UNIT-NORMALIZED (0 → 1 guard), sliced into `m`
   * subspace streams, then per subspace (all carried in one list level,
   * stepped together): farthest-point init on squared-L2 (argmax of the
   * running min-distance), `iters` Lloyd steps (argmin assignment,
   * first-wins → smaller code on ties, sample-order means, empty cell
   * keeps previous entry). Ends in a `cbv(code, sub, cv)` CTE that
   * drops into [[TextOracles.pqChain]] in place of the seed codebook.
   */
  private[text] def trainedCbv(m: Int = 8, ksub: Int = 16,
      iters: Int = 10): String = {
    val dsub = D / m
    val sb = new StringBuilder
    sb ++= s"""psamp AS (
  SELECT list(puv ORDER BY hk, id) AS PS
  FROM (SELECT hk, id,
          list_transform(pv, px -> px / (CASE WHEN pn0 = 0 THEN 1.0 ELSE pn0 END)) AS puv
        FROM (SELECT hk, id, pv, sqrt(${dot("pv", "pv")}) AS pn0
              FROM (SELECT vec_id AS id, md5(CAST(vec_id AS VARCHAR)) AS hk,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
                    FROM embeddings ORDER BY hk, id LIMIT $SampleLimit) p0a) p0b) p0c),
ps0 AS (SELECT list_transform(range($m), ps ->
          list_transform(PS, pvv -> list_slice(pvv, ps * $dsub + 1, ps * $dsub + $dsub))) AS SS
        FROM psamp),
pq0 AS (SELECT SS,
          list_transform(SS, ssub -> [ssub[1]]) AS CB,
          list_transform(SS, ssub -> list_transform(ssub, sx -> ${l2("sx", "ssub[1]")})) AS MD
        FROM ps0)"""
    for (c <- 1 until ksub) {
      sb ++= s""",
pq$c AS (
  SELECT SS,
    list_transform(range($m), ps -> list_append(CB[ps + 1], SS[ps + 1][fars[ps + 1] + 1])) AS CB,
    list_transform(range($m), ps ->
      list_transform(range(len(MD[ps + 1])), pj ->
        least(MD[ps + 1][pj + 1], ${l2("SS[ps + 1][pj + 1]", "SS[ps + 1][fars[ps + 1] + 1]")}))) AS MD
  FROM (SELECT SS, CB, MD,
          list_transform(range($m), ps -> ${argmax("MD[ps + 1]")}) AS fars
        FROM pq${c - 1}) pt$c)"""
    }
    for (it <- 1 to iters) {
      val prev = if (it == 1) s"pq${ksub - 1}" else s"pr${it - 1}"
      sb ++= s""",
pr$it AS (
  SELECT SS,
    list_transform(range($m), ps ->
      list_transform(range($ksub), pc ->
        CASE WHEN len(asg[ps + 1][pc + 1]) = 0 THEN CB[ps + 1][pc + 1]
             ELSE list_transform(range($dsub), pi ->
               list_reduce(list_transform(asg[ps + 1][pc + 1], av -> av[pi + 1]), (pa, pb) -> pa + pb)
                 / len(asg[ps + 1][pc + 1])) END)) AS CB
  FROM (
    SELECT SS, CB,
      list_transform(range($m), ps ->
        list_transform(range($ksub), pc ->
          list_transform(list_filter(range(len(SS[ps + 1])), pj -> bests[ps + 1][pj + 1] = pc),
            pj -> SS[ps + 1][pj + 1]))) AS asg
    FROM (
      SELECT SS, CB,
        list_transform(range($m), ps ->
          list_transform(range(len(SS[ps + 1])), pj ->
            (list_reduce(list_transform(range($ksub), pc -> {'s': ${l2("SS[ps + 1][pj + 1]", "CB[ps + 1][pc + 1]")}, 'c': pc}),
               (aa, ab) -> CASE WHEN ab.s < aa.s THEN ab ELSE aa END)).c)) AS bests
      FROM $prev) pu$it) pv$it)"""
    }
    sb ++= s""",
cbv AS (
  SELECT CAST(pcode AS BIGINT) AS code, CAST(psub AS INTEGER) AS sub, CB[psub + 1][pcode + 1] AS cv
  FROM pr$iters
  CROSS JOIN (SELECT unnest(range($m)) AS psub) psx
  CROSS JOIN (SELECT unnest(range($ksub)) AS pcode) pcx)"""
    sb.toString
  }

  /** Mirrors the pq_encode_trained query: every code of the TRAINED
    * codebook value-checked (strictly finer than a recall scalar). */
  val pqEncodeTrained: String = s"""WITH ${TextOracles.pqChain(trainedCbv())}
SELECT vec_id, sub, code FROM enc ORDER BY vec_id, sub"""

  /** Mirrors `recallAtK` over the TRAINED codebook: same report shape
    * as the seed-tier pqRecall (recall@5 against the exact float top-k
    * + decimal-summed mean reconstruction error). */
  val pqRecallTrained: String =
    TextOracles.pqRecallWith(TextOracles.pqChain(trainedCbv()))

  /** Mirrors the ann_production_topk query — the ENTIRE production
    * serving path replayed in SQL: trained coarse centroids
    * ([[centroidChain]]) + trained PQ codebook ([[trainedCbv]]) +
    * IVF-probed ADC candidates cut to rerankK + exact float rerank cut
    * to k. Persistence is a pass-through (the engine serves from the
    * written index; values must equal the in-memory computation), so
    * the oracle replays the computation. */
  def annProductionTopK(rerankK: Int = 50, k: Int = 5,
      queryWhere: String =
        s"n.vec_id < ${EmbeddingOps.DemoQueryCount}"): String =
    s"""WITH ${TextOracles.pqChain(trainedCbv())},
${centroidChain()},
assign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster FROM (
    SELECT n.vec_id, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN kcents c) t WHERE rn = 1),
corpuspq AS (SELECT a.neighbor_id, a.cluster, r.rv, r.rn
             FROM assign a JOIN rn2 r ON a.neighbor_id = r.vec_id),
probes AS (
  SELECT vec_id AS query_id, cid AS cluster, v AS qv, nrm AS qn FROM (
    SELECT n.vec_id, c.cid, n.v, n.nrm,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY $dotNC / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n CROSS JOIN kcents c WHERE $queryWhere) t
  WHERE rn <= 2),
cand AS (
  SELECT query_id, neighbor_id,
         round(list_reduce(list_transform(list_zip(qv, rv), zz -> zz[1] * zz[2]),
               (pa, pb) -> pa + pb) / (qn * rn), 4) AS cosine_pq
  FROM probes JOIN corpuspq USING (cluster)
  WHERE query_id <> neighbor_id),
cadc AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM cand) t
  WHERE rank <= $rerankK),
rr AS (SELECT ca.query_id, ca.neighbor_id,
         round(list_reduce(list_transform(list_zip(q.v, b.v), zz -> zz[1] * zz[2]),
               (pa, pb) -> pa + pb) / (q.nrm * b.nrm), 4) AS cosine
       FROM cadc ca JOIN n q ON q.vec_id = ca.query_id
                    JOIN n b ON b.vec_id = ca.neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rank FROM rr) t
WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors the search_hybrid_rrf query: reciprocal-rank fusion
    * (k=60) of the BM25 ranking (score desc, doc_id ties) and the
    * IVF+PQ exact-rerank ranking for query vector 0 — both chains
    * replayed in full, then the integer-rank fold. */
  def searchHybridRrf(rrfK: Int = 60, topK: Int = 20,
      rankCutoff: Int = 1000): String = s"""WITH
hlex AS MATERIALIZED (SELECT * FROM (${TextOracles.bm25Search}) hlq),
hvec AS MATERIALIZED (SELECT * FROM (
  ${annProductionTopK(50, 20, "n.vec_id = 0")}) hvq),
hlr AS (SELECT doc_id, lex_rank FROM (SELECT doc_id,
    row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
  FROM hlex) hlr0 WHERE lex_rank <= $rankCutoff),
hvr AS (SELECT neighbor_id AS doc_id, rank AS vec_rank FROM hvec),
hj AS (SELECT doc_id, lex_rank, vec_rank
       FROM hlr FULL OUTER JOIN hvr USING (doc_id)),
hf AS (SELECT doc_id, lex_rank, vec_rank,
    round(coalesce(CAST(1 AS DOUBLE) / ($rrfK + lex_rank), 0)
        + coalesce(CAST(1 AS DOUBLE) / ($rrfK + vec_rank), 0), 6) AS rrf
  FROM hj)
SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
  CAST(vec_rank AS BIGINT) AS vec_rank, rrf, rank
FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
      FROM hf) hr
WHERE rank <= $topK ORDER BY rank"""

  /** Mirrors the search_hybrid_rrf_multi query: the BATCHED fusion —
    * both serve chains replayed for the whole query relation, every
    * ranking window partitioned by query_id, per-query lexical cutoff,
    * then the integer-rank fold per (query, doc). */
  def searchHybridRrfMulti(queries: Seq[(Long, Seq[String])],
      rrfK: Int = 60, topK: Int = 20, rankCutoff: Int = 1000): String = {
    val nq = queries.map(_._1).max + 1
    s"""WITH
mlex AS MATERIALIZED (SELECT * FROM (
  ${graft.text.TextOracles.bm25MultiSearch(queries)}) mlq),
mvec AS MATERIALIZED (SELECT * FROM (
  ${annProductionTopK(50, 20, s"n.vec_id < $nq")}) mvq),
mlr AS (SELECT query_id, doc_id, lex_rank FROM (SELECT query_id, doc_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id) AS lex_rank
  FROM mlex) mlr0 WHERE lex_rank <= $rankCutoff),
mvr AS (SELECT query_id, neighbor_id AS doc_id, rank AS vec_rank FROM mvec),
mj AS (SELECT query_id, doc_id, lex_rank, vec_rank
       FROM mlr FULL OUTER JOIN mvr USING (query_id, doc_id)),
mf AS (SELECT query_id, doc_id, lex_rank, vec_rank,
    round(coalesce(CAST(1 AS DOUBLE) / ($rrfK + lex_rank), 0)
        + coalesce(CAST(1 AS DOUBLE) / ($rrfK + vec_rank), 0), 6) AS rrf
  FROM mj)
SELECT query_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
  CAST(vec_rank AS BIGINT) AS vec_rank, rrf, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY rrf DESC, doc_id) AS rank FROM mf) mr
WHERE rank <= $topK ORDER BY query_id, rank"""
  }
}
