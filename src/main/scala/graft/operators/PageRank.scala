package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fixed-iteration PageRank in EXACT integer micro-units — graph
 * centrality for curation weighting (the Common-Crawl-style "rank
 * hosts by centrality" signal; the reference pipeline has no graph
 * operator, so this is a training-data extension per the build brief).
 *
 * Exact arithmetic contract: ranks are LONGs in micro-units (initial
 * rank 1.0 = 10⁶ per node) and every iteration computes
 *
 *   rank'(v) = 150000 + (85 · Σ_{u→v} (rank(u) DIV outdeg(u))) DIV 100
 *
 * — the damping-0.85 update with BOTH divisions floored in integers.
 * Long sums are order-independent, so the result is bit-identical
 * across partitionings, engines, and the DuckDB oracle's unrolled
 * replay (the repo's micro-unit determinism discipline; float
 * PageRank would be partition-order-dependent under Spark's
 * non-deterministic aggregation order). The floors bleed ≤ 1 micro
 * unit per edge per iteration — irrelevant at ranking grain and the
 * price of exactness.
 *
 * Scale shape: per iteration ONE key-partitioned join (edges ⋈ ranks
 * on src — shuffle proportional to edges) + a hash aggregation on dst
 * + a left join back to the node set; the rank frame is
 * localCheckpoint'ed each round so lineage and optimizer time stay
 * O(1) in the iteration count (the [[graft.dedup.ConnectedComponents]]
 * discipline). No driver state beyond the loop counter; dangling
 * nodes (no out-edges) simply contribute nothing, isolated nodes
 * settle at the 150 000 damping floor.
 */
object PageRank {

  /** Micro-unit ranks after `iters` fixed iterations.
    * `nodes`: one `node` LONG column (ALL vertices, including
    * isolated); `edges`: (`src`, `dst`) directed, parallel edges
    * counted per occurrence. With `seeds` (one `node` column) the walk
    * is PERSONALIZED: teleport mass lands ONLY on the seed set (base
    * 150 000 on seeds, 0 elsewhere; initial rank 10⁶ on seeds, 0
    * elsewhere) — ranks measure proximity to the seeds instead of
    * global centrality. Output: (node, rank_u). */
  def ranksMicro(nodes: DataFrame, edges: DataFrame,
      iters: Int = 10, seeds: Option[DataFrame] = None): DataFrame = {
    require(iters > 0, "iters must be positive")
    val outdeg = edges.groupBy("src")
      .agg(count(lit(1)).cast("long").as("outdeg"))
    // computed once, joined by every iteration: without the checkpoint
    // each of the `iters` contribution joins re-derives the edge frame
    // AND the out-degree aggregation from source (round-15
    // optimization; values unchanged — the frame is deterministic)
    val e = edges.join(outdeg, "src").localCheckpoint()
    // base/init frame: computed once, reused by every iteration
    val nb = (seeds match {
      case Some(sd) =>
        val isSeed = nodes.join(
          sd.select(col(sd.columns.head).as("node"))
            .distinct().withColumn("__seed", lit(1)),
          Seq("node"), "left")
        isSeed.select(col("node"),
          when(col("__seed").isNotNull, lit(150000L)).otherwise(lit(0L))
            .as("base"),
          when(col("__seed").isNotNull, lit(1000000L)).otherwise(lit(0L))
            .as("rank_u"))
      case None =>
        nodes.select(col("node"), lit(150000L).as("base"),
          lit(1000000L).as("rank_u"))
    }).localCheckpoint()
    var r = nb.select("node", "rank_u")
    for (_ <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst").as("node"),
          expr("rank_u DIV outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      r = nb.select("node", "base").join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("base") + expr("(85 * coalesce(s, 0)) DIV 100"))
            .as("rank_u"))
        .localCheckpoint()
    }
    r
  }

  // ------------------------------------------------ oracle SQL emission

  /** DuckDB replay of [[ranksMicro]] given caller-provided CTEs
    * `nodes(node)` and `edges(src, dst)` — and, when `personalized`,
    * `seeds(node)`: out-degrees, the base/init relation, then `iters`
    * unrolled join+agg iterations of the SAME integer update — ending
    * in `r{iters}(node, r)`. Each r{k} is MATERIALIZED (referenced by
    * the next step's join; default inlining would re-derive the whole
    * chain per reference). */
  def oracleRanksCtes(iters: Int, personalized: Boolean = false): String = {
    val nb =
      if (personalized)
        s"""nb AS MATERIALIZED (
  SELECT n.node,
    CASE WHEN s.node IS NOT NULL THEN CAST(150000 AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS base,
    CASE WHEN s.node IS NOT NULL THEN CAST(1000000 AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS r0
  FROM nodes n LEFT JOIN (SELECT DISTINCT node FROM seeds) s
    ON s.node = n.node)"""
      else
        s"""nb AS MATERIALIZED (
  SELECT node, CAST(150000 AS BIGINT) AS base,
    CAST(1000000 AS BIGINT) AS r0 FROM nodes)"""
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
  SELECT n.node,
    CAST(n.base + (85 * coalesce(sum(rp.r // e.od), 0)) // 100
      AS BIGINT) AS r
  FROM nb n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN r${k - 1} rp ON rp.node = e.src
  GROUP BY n.node, n.base)"""
    }.mkString(",\n")
    s"""outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
           FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, outdeg.od
     FROM edges JOIN outdeg USING (src)),
$nb,
r0 AS MATERIALIZED (SELECT node, r0 AS r FROM nb),
$steps"""
  }
}
