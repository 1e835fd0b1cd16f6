package graft.embeddings

/**
 * DuckDB oracles that RECOMPUTE [[Opq.train]] — the
 * [[graft.text.KmeansOracles]] / [[PcaOracles]] replay discipline
 * applied to the full OPQ alternation. Everything [[Opq]] computes is
 * driver double arithmetic with pinned fold orders, so the oracle
 * replays it exactly:
 *
 *  - the md5-ordered unit-normalized sample (the trainedCodebook CTE);
 *  - the flat uncentered second moment (ascending sample-order folds);
 *  - SIMULTANEOUS orthogonal iteration (identity seed, per step one
 *    matmul + one Gram–Schmidt expressed as a `list_reduce` append
 *    fold over columns — this bounded-CTE shape is exactly why the
 *    engine's eigensolver iterates the whole basis at once);
 *  - the greedy eigenvalue allocation as a RECURSIVE CTE (64 steps of
 *    argmin-open-subspace with the driver's strict-<-first-wins rule);
 *  - per alternation: rotate, the trainedCbv Lloyd chain over the
 *    rotated sample, reconstruction, M = Σ c xᵀ, MᵀM, a second eigen
 *    chain (V), U = M·V/σ re-orthonormalized, R = U Vᵀ;
 *  - a final Lloyd chain synced to the final rotation;
 *  - serving: the micro-quantized rotation applied to every corpus
 *    vector as EXACT BIGINT dots (the pca_project_k kernel's
 *    arithmetic), then the pqChain encode/decode/ADC shapes.
 */
object OpqOracles {

  private val D = 64
  private val M = 8
  private val Ksub = 16
  private val Dsub = D / M
  private val SampleLimit = 4096

  private val fold = "(p, q) -> p + q"
  private def dot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), zz -> zz[1] * zz[2]), $fold)"
  private def l2(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), zz -> (zz[1] - zz[2]) * (zz[1] - zz[2])), $fold)"

  /** Normalize a vector expression with the 1e-12 guard. The VALUE is
    * identical however often subexpressions re-evaluate, but DuckDB
    * does NOT hoist loop-invariant lambda subexpressions — so bind the
    * argument and its norm ONCE via single-element `list_transform`
    * lets (this is what turned a 21 s/step eigen replay into
    * sub-second: the naive spelling re-evaluated the full projection
    * fold 64×64 times per column). */
  private def norml(v: String): String =
    s"""list_transform([$v], nv ->
      list_transform([greatest(sqrt(list_reduce(list_transform(nv, nz -> nz * nz), $fold)), 1e-12)],
        nn -> list_transform(nv, nx -> nx / nn))[1])[1]"""

  /** Gram–Schmidt over a list-of-columns expression: ascending column
    * order, ascending-j projection sweeps (the `list_prepend` seed
    * makes the running vector the fold accumulator), guarded
    * normalization — [[Opq.gramSchmidt]] verbatim. The projection dot
    * is let-bound so it evaluates once per (column, prior) pair, not
    * once per element. */
  private def gs(b: String): String = {
    val ortho = s"list_reduce(list_prepend(el[1], acc), " +
      s"(vv, qq) -> list_transform([${dot("qq", "vv")}], dj -> " +
      s"list_transform(list_zip(vv, qq), zz -> zz[1] - dj * zz[2]))[1])"
    s"""list_reduce(
    list_transform(range($D), gc -> CASE WHEN gc = 0 THEN [${norml(s"($b)[1]")}] ELSE [($b)[gc + 1]] END),
    (acc, el) -> list_append(acc, ${norml(ortho)}))"""
  }

  /** Matrix-vector product of a FLAT row-major d×d expression with a
    * column expression — ascending-j folds per element. */
  private def mvFlat(aFlat: String, qc: String): String =
    s"list_transform(range($D), mi -> list_reduce(list_transform(range($D), " +
      s"mj -> ($aFlat)[mi * $D + mj + 1] * ($qc)[mj + 1]), $fold))"

  /** One eigen chain: `iters` orthogonal-iteration steps on the flat
    * matrix column `AF` of `srcCte`, ending in `${p}e$iters(AF, Q)`. */
  private def eigenChain(p: String, srcCte: String, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
${p}e0 AS MATERIALIZED (SELECT AF,
  list_transform(range($D), qc -> list_transform(range($D),
    qi -> CASE WHEN qi = qc THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)) AS Q
  FROM $srcCte)"""
    for (t <- 1 to iters) {
      sb ++= s""",
${p}e$t AS MATERIALIZED (SELECT AF, ${gs("B")} AS Q
  FROM (SELECT AF, list_transform(Q, qc -> ${mvFlat("AF", "qc")}) AS B
        FROM ${p}e${t - 1}) ${p}x$t)"""
    }
    sb.toString
  }

  /** The trainedCodebook Lloyd chain over an already-rotated sample
    * list `YS` (NO re-normalization — the driver trains on the rotated
    * unit vectors as-is): farthest-point init, `lloydIters` refits,
    * ending in `${p}cb(CB)` with CB = m × ksub × dsub nested lists. */
  private def lloydChain(p: String, srcCte: String, lloydIters: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
${p}s0 AS MATERIALIZED (SELECT
  list_transform(range($M), ps -> list_transform(YS,
    pvv -> list_slice(pvv, ps * $Dsub + 1, ps * $Dsub + $Dsub))) AS SS
  FROM $srcCte),
${p}q0 AS MATERIALIZED (SELECT SS,
  list_transform(SS, ssub -> [ssub[1]]) AS CB,
  list_transform(SS, ssub -> list_transform(ssub, sx -> ${l2("sx", "ssub[1]")})) AS MD
  FROM ${p}s0)"""
    for (c <- 1 until Ksub) {
      sb ++= s""",
${p}q$c AS MATERIALIZED (
  SELECT SS,
    list_transform(range($M), ps -> list_append(CB[ps + 1], SS[ps + 1][fars[ps + 1] + 1])) AS CB,
    list_transform(range($M), ps ->
      list_transform(range(len(MD[ps + 1])), pj ->
        least(MD[ps + 1][pj + 1], ${l2("SS[ps + 1][pj + 1]", "SS[ps + 1][fars[ps + 1] + 1]")}))) AS MD
  FROM (SELECT SS, CB, MD,
          list_transform(range($M), ps ->
            (list_reduce(list_transform(range(len(MD[ps + 1])), ai -> {'v': MD[ps + 1][ai + 1], 'j': ai}),
              (aa, ab) -> CASE WHEN ab.v > aa.v THEN ab ELSE aa END)).j) AS fars
        FROM ${p}q${c - 1}) ${p}t$c)"""
    }
    for (it <- 1 to lloydIters) {
      val prev = if (it == 1) s"${p}q${Ksub - 1}" else s"${p}r${it - 1}"
      sb ++= s""",
${p}r$it AS MATERIALIZED (
  SELECT SS,
    list_transform(range($M), ps ->
      list_transform(range($Ksub), pc ->
        CASE WHEN len(asg[ps + 1][pc + 1]) = 0 THEN CB[ps + 1][pc + 1]
             ELSE list_transform(range($Dsub), pi ->
               list_reduce(list_transform(asg[ps + 1][pc + 1], av -> av[pi + 1]), $fold)
                 / len(asg[ps + 1][pc + 1])) END)) AS CB
  FROM (
    SELECT SS, CB,
      list_transform(range($M), ps ->
        list_transform(range($Ksub), pc ->
          list_transform(list_filter(range(len(SS[ps + 1])), pj -> bests[ps + 1][pj + 1] = pc),
            pj -> SS[ps + 1][pj + 1]))) AS asg
    FROM (
      SELECT SS, CB,
        list_transform(range($M), ps ->
          list_transform(range(len(SS[ps + 1])), pj ->
            (list_reduce(list_transform(range($Ksub), pc -> {'s': ${l2("SS[ps + 1][pj + 1]", "CB[ps + 1][pc + 1]")}, 'c': pc}),
               (aa, ab) -> CASE WHEN ab.s < aa.s THEN ab ELSE aa END)).c)) AS bests
      FROM $prev) ${p}u$it) ${p}v$it),"""
      sb.setLength(sb.length - 1) // drop trailing comma
    }
    sb ++= s""",
${p}cb AS MATERIALIZED (SELECT CB FROM ${p}r$lloydIters)"""
    sb.toString
  }

  /** Code assignment + reconstruction of each vector of `YS` under a
    * CB — strict-< first-wins argmin per subspace, entries concatenated
    * in subspace order. */
  private def reconExpr(ys: String, cb: String): String = {
    val code = s"(list_reduce(list_transform(range($Ksub), rc -> " +
      s"{'s': ${l2(s"list_slice(yv, rs * $Dsub + 1, rs * $Dsub + $Dsub)", s"($cb)[rs + 1][rc + 1]")}, 'c': rc}), " +
      "(aa, ab) -> CASE WHEN ab.s < aa.s THEN ab ELSE aa END)).c"
    s"list_transform($ys, yv -> flatten(list_transform(range($M), rs -> ($cb)[rs + 1][$code + 1])))"
  }

  /** The full training chain, ending in `orfin(R)` (list of row lists)
    * and `ocbf(CB)` (the final synced codebook). Matches
    * `Opq.train(m=8, ksub=16, alternations=1, eigIters=16,
    * lloydIters=10, sampleSize=4096)`. */
  private def trainChain(eigIters: Int = 16, lloydIters: Int = 10): String = {
    val sb = new StringBuilder
    // sample (the trainedCbv psamp shape, one list PS)
    sb ++= s"""osamp AS MATERIALIZED (
  SELECT list(puv ORDER BY hk, id) AS PS
  FROM (SELECT hk, id,
          list_transform(pv, px -> px / (CASE WHEN pn0 = 0 THEN 1.0 ELSE pn0 END)) AS puv
        FROM (SELECT hk, id, pv, sqrt(${dot("pv", "pv")}) AS pn0
              FROM (SELECT vec_id AS id, md5(CAST(vec_id AS VARCHAR)) AS hk,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
                    FROM embeddings ORDER BY hk, id LIMIT $SampleLimit) o0a) o0b) o0c),
oa AS MATERIALIZED (SELECT PS,
  list_transform(range(${D * D}), op ->
    list_reduce(list_transform(PS, sv -> sv[op // $D + 1] * sv[op % $D + 1]), $fold)
      / len(PS)) AS AF
  FROM osamp)"""
    // init eigen on AF
    sb ++= eigenChain("oi", "oa", eigIters)
    // Rayleigh eigenvalues + (λ desc, idx asc) order
    sb ++= s""",
olam AS MATERIALIZED (SELECT AF, Q,
  list_transform(Q, qc -> ${dot("qc", mvFlat("AF", "qc"))}) AS lam
  FROM oie$eigIters),
oord AS MATERIALIZED (
  SELECT list(oi ORDER BY olamv DESC, oi) AS ord
  FROM (SELECT unnest(range($D)) AS oi, unnest(lam) AS olamv FROM olam) oo1),
oalloc AS (
  SELECT 0 AS step,
    CAST([] AS STRUCT(s INTEGER, idx BIGINT, ord INTEGER)[]) AS asg,
    list_transform(range($M), zz -> CAST(0 AS DOUBLE)) AS sums,
    list_transform(range($M), zz -> CAST(0 AS INTEGER)) AS caps
  UNION ALL
  SELECT step + 1,
    list_append(asg, {'s': CAST(pick AS INTEGER), 'idx': eidx, 'ord': caps[pick + 1]}),
    list_transform(range($M), ps -> CASE WHEN ps = pick
      THEN sums[ps + 1] + ln(greatest(lamv, 1e-12)) ELSE sums[ps + 1] END),
    list_transform(range($M), ps -> CASE WHEN ps = pick
      THEN caps[ps + 1] + 1 ELSE caps[ps + 1] END)
  FROM (
    SELECT g.step, g.asg, g.sums, g.caps, o.ord[g.step + 1] AS eidx,
      l.lam[o.ord[g.step + 1] + 1] AS lamv,
      (list_reduce(list_transform(range($M), ai ->
         {'v': CASE WHEN g.caps[ai + 1] < $Dsub THEN g.sums[ai + 1] ELSE NULL END, 'j': ai}),
        (aa, ab) -> CASE WHEN ab.v IS NOT NULL AND (aa.v IS NULL OR ab.v < aa.v)
                    THEN ab ELSE aa END)).j AS pick
    FROM oalloc g, oord o, olam l WHERE g.step < $D) og),
or0 AS MATERIALIZED (
  SELECT list_transform(pidx, pi -> Q[pi + 1]) AS R
  FROM (SELECT list(ua.idx ORDER BY ua.s, ua.ord) AS pidx
        FROM (SELECT unnest(asg) AS ua FROM oalloc WHERE step = $D) ou0) op0,
       olam)"""
    // ---- alternation 1: rotate, Lloyd, Procrustes
    sb ++= s""",
oy1 AS MATERIALIZED (
  SELECT list_transform(PS, xv -> list_transform(R, rrow -> ${dot("rrow", "xv")})) AS YS
  FROM osamp, or0)"""
    sb ++= lloydChain("la", "oy1", lloydIters)
    sb ++= s""",
orec AS MATERIALIZED (SELECT ${reconExpr("YS", "CB")} AS REC FROM oy1, lacb),
omf AS MATERIALIZED (
  SELECT list_transform(range(${D * D}), op ->
    list_reduce(list_transform(range(len(PS)), oj ->
      REC[oj + 1][op // $D + 1] * PS[oj + 1][op % $D + 1]), $fold)) AS MF
  FROM osamp, orec),
oa2 AS MATERIALIZED (
  SELECT list_transform(range(${D * D}), op ->
    list_reduce(list_transform(range($D), okk ->
      MF[okk * $D + op // $D + 1] * MF[okk * $D + op % $D + 1]), $fold)) AS AF
  FROM omf)"""
    sb ++= eigenChain("of", "oa2", eigIters)
    sb ++= s""",
ou AS MATERIALIZED (
  SELECT ${gs("UP")} AS U, V
  FROM (SELECT Q AS V,
          list_transform(Q, vc ->
            list_transform([sqrt(greatest(${dot("vc", mvFlat("AF", "vc"))}, 1e-24))],
              sg -> list_transform(${mvFlat("MF", "vc")}, ux -> ux / sg))[1]) AS UP
        FROM ofe$eigIters, omf) oup),
orfin AS MATERIALIZED (
  SELECT list_transform(range($D), rr -> list_transform(range($D), rl ->
    list_reduce(list_transform(range($D), rc -> U[rc + 1][rr + 1] * V[rc + 1][rl + 1]), $fold))) AS R
  FROM ou),
oy2 AS MATERIALIZED (
  SELECT list_transform(PS, xv -> list_transform(R, rrow -> ${dot("rrow", "xv")})) AS YS
  FROM osamp, orfin)"""
    sb ++= lloydChain("lb", "oy2", lloydIters)
    sb ++= s""",
ocbf AS MATERIALIZED (SELECT CB FROM lbcb)"""
    sb.toString
  }

  /** Serving chain: micro rotation of every corpus vector (exact
    * BIGINT dots — the pca_project_k arithmetic), then the pqChain
    * encode/decode shapes against the final codebook. Ends in `yn`
    * (rotated vectors + guarded norms), `orn2` (reconstructions). */
  private def serveChain: String = s""",
oru AS MATERIALIZED (
  SELECT flatten(list_transform(R, rrow ->
    list_transform(rrow, rx -> CAST(floor(rx * 1e6 + 0.5) AS BIGINT)))) AS RU
  FROM orfin),
oun AS MATERIALIZED (
  SELECT vec_id,
    list_transform(uv0, ux -> CAST(floor(ux * 1e6 + 0.5) AS BIGINT)) AS mu
  FROM (SELECT vec_id,
          list_transform(v, x -> x / (CASE WHEN n0 = 0 THEN 1.0 ELSE n0 END)) AS uv0
        FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                sqrt(${dot("list_transform(embedding, x -> CAST(x AS DOUBLE))",
      "list_transform(embedding, x -> CAST(x AS DOUBLE))")}) AS n0
              FROM embeddings) ou1) ou2),
yn AS MATERIALIZED (
  SELECT vec_id, y, yn0 AS ynraw,
    (CASE WHEN yn0 = 0 THEN 1.0 ELSE yn0 END) AS ynrm
  FROM (SELECT vec_id, y, sqrt(${dot("y", "y")}) AS yn0
        FROM (SELECT vec_id,
                list_transform(range($D), yq ->
                  CAST(list_reduce(list_transform(range($D), yi ->
                    mu[yi + 1] * RU[yq * $D + yi + 1]), $fold) AS DOUBLE) / 1e12) AS y
              FROM oun, oru) oy0) oy1b),
ocbv AS MATERIALIZED (
  SELECT CAST(pcode AS BIGINT) AS code, CAST(psub AS INTEGER) AS sub,
         CB[psub + 1][pcode + 1] AS cv
  FROM ocbf
  CROSS JOIN (SELECT unnest(range($M)) AS psub) osx
  CROSS JOIN (SELECT unnest(range($Ksub)) AS pcode) ocx),
oenc AS MATERIALIZED (SELECT vec_id, sub, code FROM (
  SELECT x.vec_id, cb.sub, cb.code,
         row_number() OVER (PARTITION BY x.vec_id, cb.sub ORDER BY
           ${l2(s"list_slice(x.uy, cb.sub * $Dsub + 1, cb.sub * $Dsub + $Dsub)", "cb.cv")} ASC,
           cb.code ASC) AS rn
  FROM (SELECT vec_id, list_transform(y, yx -> yx / ynrm) AS uy FROM yn) x
  CROSS JOIN ocbv cb) ot WHERE rn = 1),
orec2 AS MATERIALIZED (
  SELECT e2.vec_id, flatten(list(cb.cv ORDER BY e2.sub)) AS rv
  FROM oenc e2 JOIN ocbv cb ON e2.sub = cb.sub AND e2.code = cb.code
  GROUP BY e2.vec_id),
orn2 AS MATERIALIZED (
  SELECT vec_id, rv,
    CASE WHEN sqrt(${dot("rv", "rv")}) = 0 THEN 1.0
         ELSE sqrt(${dot("rv", "rv")}) END AS rn
  FROM orec2)"""

  /** Mirrors the ann_opq_topk query: rotated-space ADC top-5 — rotated
    * float queries against the decoded OPQ reconstructions. */
  def annOpqTopK(k: Int = 5): String = s"""WITH RECURSIVE ${trainChain()}$serveChain,
ocand AS (SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
    round(${dot("q.y", "r.rv")} / (q.ynraw * r.rn), 4) AS cosine_pq
  FROM yn q CROSS JOIN orn2 r
  WHERE q.vec_id < ${EmbeddingOps.DemoQueryCount} AND q.vec_id <> r.vec_id)
SELECT query_id, neighbor_id, cosine_pq, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM ocand) ot2
WHERE rank <= $k ORDER BY query_id, rank"""

  /**
   * Mirrors the ann_opq_production_topk query — the complete faiss
   * factory path `OPQ8,IVF8,PQ8,Refine(Flat)` replayed end to end:
   * the full OPQ alternation ([[trainChain]]), the exact-integer
   * corpus rotation + rotated codes/reconstructions ([[serveChain]]),
   * the coarse quantizer trained IN ROTATED SPACE (the
   * [[graft.text.KmeansOracles.centroidChain]] Lloyd replay with the
   * rotated relation as its sample source), rotated-space probe + ADC
   * to rerankK candidates, and the exact float rerank on the ORIGINAL
   * vectors. Persistence is a pass-through (rotated codes round-trip
   * parquet exactly), so the oracle replays the computation.
   */
  def annOpqProductionTopK(nlist: Int = 8, nprobe: Int = 2,
      rerankK: Int = 50, k: Int = 5): String =
    s"""WITH RECURSIVE ${trainChain()}$serveChain,
${graft.text.TextOracles.normCte},
${graft.text.KmeansOracles.centroidChain(nlist, 10,
      "(SELECT vec_id, y AS embedding FROM yn)")},
passign AS (
  SELECT vec_id AS neighbor_id, cid AS cluster FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY ${dot("q.y", "c.cv")} / (q.ynraw * c.cn) DESC, c.cid) AS prn
    FROM yn q CROSS JOIN kcents c) pt WHERE prn = 1),
pcorpus AS (SELECT a.neighbor_id, a.cluster, r.rv, r.rn
            FROM passign a JOIN orn2 r ON a.neighbor_id = r.vec_id),
pprobes AS (
  SELECT vec_id AS query_id, cid AS cluster, y AS qv, ynraw AS qn FROM (
    SELECT q.vec_id, c.cid, q.y, q.ynraw,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY ${dot("q.y", "c.cv")} / (q.ynraw * c.cn) DESC, c.cid) AS prn
    FROM yn q CROSS JOIN kcents c
    WHERE q.vec_id < ${EmbeddingOps.DemoQueryCount}) pt2
  WHERE prn <= $nprobe),
pcand AS (
  SELECT query_id, neighbor_id,
         round(${dot("qv", "rv")} / (qn * rn), 4) AS cosine_pq
  FROM pprobes JOIN pcorpus USING (cluster)
  WHERE query_id <> neighbor_id),
pcadc AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_pq DESC, neighbor_id) AS rank FROM pcand) pt3
  WHERE rank <= $rerankK),
prr AS (SELECT ca.query_id, ca.neighbor_id,
         round(${dot("q.v", "b.v")} / (q.nrm * b.nrm), 4) AS cosine
       FROM pcadc ca JOIN n q ON q.vec_id = ca.query_id
                     JOIN n b ON b.vec_id = ca.neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rank FROM prr) pt4
WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors the opq_recall query: recall@5 of the rotated-space ADC
    * against the exact float top-5 on the ORIGINAL vectors, plus the
    * mean absolute reconstruction error in rotated space. */
  def opqRecall(k: Int = 5): String = s"""WITH RECURSIVE ${trainChain()}$serveChain,
${graft.text.TextOracles.normCte},
oexact AS (SELECT query_id, neighbor_id FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round(${dot("a.v", "b.v")} / (a.nrm * b.nrm), 4) DESC, b.vec_id) AS rank
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < ${EmbeddingOps.DemoQueryCount}) ot3 WHERE rank <= $k),
oopq AS (SELECT query_id, neighbor_id FROM (
  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY round(${dot("q.y", "r.rv")} / (q.ynrm * r.rn), 4) DESC, r.vec_id) AS rank
  FROM yn q CROSS JOIN orn2 r
  WHERE q.vec_id < ${EmbeddingOps.DemoQueryCount} AND q.vec_id <> r.vec_id) ot4
  WHERE rank <= $k),
ohits AS (SELECT count(*) AS total_hits FROM oexact JOIN oopq USING (query_id, neighbor_id)),
onqs AS (SELECT count(DISTINCT query_id) AS n_queries FROM oexact),
oerr AS (SELECT round(CAST(sum(CAST(round(e, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_abs_err
  FROM (SELECT unnest(list_transform(list_zip(
          list_transform(q.y, yx -> yx / q.ynrm), r.rv),
          zz -> abs(zz[1] - zz[2]))) AS e
        FROM yn q JOIN orec2 r USING (vec_id)) ot5)
SELECT $k AS k, n_queries,
       round(CAST(total_hits AS DOUBLE) / (n_queries * $k), 4) AS recall_at_k,
       mean_abs_err
FROM ohits CROSS JOIN onqs CROSS JOIN oerr"""
}
