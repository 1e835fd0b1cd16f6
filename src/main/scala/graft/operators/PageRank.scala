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
    * counted per occurrence. Output: (node, rank_u). */
  def ranksMicro(nodes: DataFrame, edges: DataFrame,
      iters: Int = 10): DataFrame = {
    require(iters > 0, "iters must be positive")
    val outdeg = edges.groupBy("src")
      .agg(count(lit(1)).cast("long").as("outdeg"))
    val e = edges.join(outdeg, "src")
    var r = nodes.select(col("node"), lit(1000000L).as("rank_u"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst").as("node"),
          expr("rank_u DIV outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(s, 0)) DIV 100"))
            .as("rank_u"))
        .localCheckpoint()
    }
    r
  }

  // ------------------------------------------------ oracle SQL emission

  /** DuckDB replay of [[ranksMicro]] given caller-provided CTEs
    * `nodes(node)` and `edges(src, dst)`: out-degrees, then `iters`
    * unrolled join+agg iterations of the SAME integer update — ending
    * in `r{iters}(node, r)`. Each r{k} is MATERIALIZED (referenced by
    * the next step's join; default inlining would re-derive the whole
    * chain per reference). */
  def oracleRanksCtes(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
  SELECT n.node,
    CAST(150000 + (85 * coalesce(sum(rp.r // e.od), 0)) // 100
      AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN r${k - 1} rp ON rp.node = e.src
  GROUP BY n.node)"""
    }.mkString(",\n")
    s"""outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
           FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, outdeg.od
     FROM edges JOIN outdeg USING (src)),
r0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
$steps"""
  }
}
