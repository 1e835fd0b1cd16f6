package graft.embeddings

/**
 * DuckDB oracles that RECOMPUTE [[Pca.fit]] — no baked-in component
 * literals. The corpus statistics (micro quantization, integer mean,
 * exact scatter sums) replay as grouped SQL over exact integers; the
 * bounded eigen-loop replays as a CTE chain of single-row list
 * computations whose double arithmetic pins the same fold orders as
 * the Scala loops (ascending-index `list_reduce` sums, strict-`>`
 * first-wins argmax folds, the `greatest(·, 1e-12)` norm guard, the
 * once-computed `dj` Gram–Schmidt sweeps in ascending component
 * order) — the
 * [[graft.text.KmeansOracles]] discipline applied to the power method.
 *
 * Every iteration CTE is `AS MATERIALIZED`: the chain is linear
 * (4 components × iters steps) and each step must be computed once,
 * not re-inlined per reference (the kn5 lesson).
 */
object PcaOracles {

  /** Embedding width of the demo corpus. */
  private val D = 64

  private val fold = "(p, q) -> p + q"

  /** Matrix-vector element i over flat row-major A and v (both 1-based
    * lists), ascending-j fold — `matvec` in [[Pca.fit]]. */
  private def mvElem(d: Int): String =
    s"list_reduce(list_transform(range($d), j -> A[i * $d + j + 1] * v[j + 1]), $fold)"

  /** Strict-`>` first-wins argmax of per-index weights `w(i)` — the
    * `if (x > best)` scans in [[Pca.fit]]. */
  private def argmaxIdx(d: Int, w: String): String =
    s"(list_reduce(list_transform(range($d), i -> {'w': $w, 'j': i}), " +
      "(aa, ab) -> CASE WHEN ab.w > aa.w THEN ab ELSE aa END)).j"

  /**
   * The full training chain: corpus statistics, then per component c
   * the init/iterate(+Gram–Schmidt)/Rayleigh/flip CTEs. Ends with `pcw{c}`
   * (micro weight list) and `pcf{c}` (raw component + lam) per
   * component, plus `pcc` (centered corpus) and `pctr` (trace).
   */
  private def chain(k: Int, iters: Int, d: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""pcmu AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS mu
  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = $d),
pcn AS (SELECT count(*) AS n FROM pcmu),
pcmb AS MATERIALIZED (
  SELECT list(mb ORDER BY dim0) AS MB
  FROM (SELECT dim0, CAST(floor(CAST(sum(m) AS DOUBLE) / n + 0.5) AS BIGINT) AS mb
        FROM (SELECT generate_subscripts(mu, 1) - 1 AS dim0, unnest(mu) AS m
              FROM pcmu) e, pcn
        GROUP BY dim0, n) g),
pcc AS MATERIALIZED (
  SELECT vec_id, list_transform(list_zip(mu, MB), z -> z[1] - z[2]) AS c
  FROM pcmu, pcmb),
pcs AS MATERIALIZED (
  SELECT pos, sum(p) AS s
  FROM (SELECT generate_subscripts(fp, 1) - 1 AS pos, unnest(fp) AS p
        FROM (SELECT flatten(list_transform(c,
                ci -> list_transform(c, cj -> ci * cj))) AS fp FROM pcc) f) e
  GROUP BY pos),
pca0 AS MATERIALIZED (
  SELECT list(CAST(s AS DOUBLE) / n / 1e12 ORDER BY pos) AS A
  FROM pcs, pcn GROUP BY n),
pctr AS (SELECT list_reduce(list_transform(range($d), i -> A[i * $d + i + 1]),
           $fold) AS tr FROM pca0)"""
    sb ++= s""",
pcidx AS (SELECT ${argmaxIdx(d, s"A[i * $d + i + 1]")} AS idx FROM pca0)"""
    for (c <- 0 until k) {
      sb ++= s""",
pci$c AS MATERIALIZED (
  SELECT A, list_transform(range($d),
           i -> CASE WHEN i = (idx + $c) % $d THEN CAST(1 AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END) AS v
  FROM pca0, pcidx)"""
      var prev = s"pci$c"
      for (t <- 1 to iters) {
        sb ++= s""",
pcy${c}_${t}_0 AS MATERIALIZED (
  SELECT A, list_transform(range($d), i -> ${mvElem(d)}) AS y FROM $prev)"""
        var ystep = s"pcy${c}_${t}_0"
        for (j <- 0 until c) {
          // Gram–Schmidt sweep against found component j: dot computed
          // once (ascending fold), then y_i - dj*Q_i — the driver loop
          sb ++= s""",
pcy${c}_${t}_${j + 1} AS MATERIALIZED (
  SELECT A, list_transform(range($d), i -> y[i + 1] - dj * Q[i + 1]) AS y
  FROM (SELECT g.A, g.y, q.v AS Q,
          list_reduce(list_transform(range($d),
            i -> q.v[i + 1] * g.y[i + 1]), $fold) AS dj
        FROM $ystep g, pcq$j q) s)"""
          ystep = s"pcy${c}_${t}_${j + 1}"
        }
        sb ++= s""",
pcv${c}_$t AS MATERIALIZED (
  SELECT A, list_transform(y, x -> x / greatest(sqrt(
           list_reduce(list_transform(y, z -> z * z), $fold)),
           1e-12)) AS v
  FROM $ystep)"""
        prev = s"pcv${c}_$t"
      }
      sb ++= s""",
pcl$c AS MATERIALIZED (
  SELECT A, v, list_reduce(list_transform(range($d),
           i -> v[i + 1] * ${mvElem(d)}), $fold) AS lam
  FROM $prev),
pcf$c AS MATERIALIZED (
  SELECT lam, CASE WHEN v[mi + 1] < 0
                   THEN list_transform(v, x -> -x) ELSE v END AS v
  FROM (SELECT v, lam, ${argmaxIdx(d, s"abs(v[i + 1])")} AS mi
        FROM pcl$c) q),
pcq$c AS MATERIALIZED (SELECT v FROM pcf$c),
pcw$c AS MATERIALIZED (
  SELECT list_transform(v, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS W
  FROM pcf$c)"""
    }
    // output permutation: eigenvalue descending, found-order on ties —
    // Pca.fit's deterministic reorder as a rank window
    val lamUnion = (0 until k)
      .map(c => s"SELECT $c AS c, lam FROM pcf$c").mkString("\n  UNION ALL\n  ")
    val wUnion = (0 until k)
      .map(c => s"SELECT $c AS c, W FROM pcw$c").mkString("\n  UNION ALL\n  ")
    sb ++= s""",
pcall AS MATERIALIZED (
  $lamUnion),
pcrank AS MATERIALIZED (
  -- lam + 0.0 pins a −0.0/+0.0 pair to a TIE (found-order wins),
  -- matching the driver's ==-then-index comparison; SQL's total
  -- double order would otherwise rank +0.0 above −0.0
  SELECT c, row_number() OVER (ORDER BY lam + 0.0 DESC, c) - 1 AS rk, lam
  FROM pcall),
pcwall AS MATERIALIZED (
  SELECT r.rk, w.W, r.lam
  FROM (
  $wUnion) w JOIN pcrank r USING (c))"""
    for (r <- 0 until k) {
      sb ++= s""",
pcwr$r AS MATERIALIZED (SELECT W, lam FROM pcwall WHERE rk = $r)"""
    }
    sb.toString
  }

  /** Mirrors the embed_pca_components query: (component, dim, w) with
    * w the micro weight back in value units. */
  def componentsSql(k: Int = 4, iters: Int = 32, d: Int = D): String =
    s"""WITH ${chain(k, iters, d)}
SELECT rk AS component, generate_subscripts(W, 1) - 1 AS dim,
  CAST(unnest(W) AS DOUBLE) / 1e6 AS w
FROM pcwall ORDER BY component, dim"""

  /** Mirrors embed_pca_eigenvalues: raw Rayleigh quotients and the
    * trace-guarded variance shares (`+ 0.0` pins −0.0 on both sides). */
  def eigenvaluesSql(k: Int = 4, iters: Int = 32, d: Int = D): String =
    s"""WITH ${chain(k, iters, d)}
SELECT rk AS component, lam + 0.0 AS lambda,
  lam / greatest(tr, 1e-12) + 0.0 AS var_share
FROM pcrank CROSS JOIN pctr ORDER BY component"""

  /** Mirrors embed_pca_project (and the from-model serve twin —
    * persistence is an integer pass-through): the exact integer dot of
    * the centered micro vector with each micro weight list, rescaled
    * once. */
  def projectSql(k: Int = 4, iters: Int = 32, d: Int = D): String = {
    val cols = (0 until k).map(c =>
      s"""CAST(list_reduce(list_transform(list_zip(c.c, w$c.W),
       z -> z[1] * z[2]), $fold) AS DOUBLE) / 1e12 AS p$c""")
      .mkString(",\n  ")
    val joins = (0 until k).map(c => s"CROSS JOIN pcwr$c w$c").mkString(" ")
    s"""WITH ${chain(k, iters, d)}
SELECT c.vec_id,
  $cols
FROM pcc c $joins ORDER BY c.vec_id"""
  }

  /** Mirrors embed_pca_whiten: the projection divided by the
    * norm-guarded √λ of its (rank-ordered) component — the same IEEE
    * sqrt/divide of the same Rayleigh quotient the engine bakes in as
    * a literal scale. */
  def whitenSql(k: Int = 4, iters: Int = 32, d: Int = D): String = {
    val cols = (0 until k).map(c =>
      s"""CAST(list_reduce(list_transform(list_zip(c.c, w$c.W),
       z -> z[1] * z[2]), $fold) AS DOUBLE) / 1e12
       / sqrt(greatest(w$c.lam, 1e-12)) AS w$c""")
      .mkString(",\n  ")
    val joins = (0 until k).map(c => s"CROSS JOIN pcwr$c w$c").mkString(" ")
    s"""WITH ${chain(k, iters, d)}
SELECT c.vec_id,
  $cols
FROM pcc c $joins ORDER BY c.vec_id"""
  }
}
