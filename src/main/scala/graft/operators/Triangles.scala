package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact triangle counting + local clustering coefficients — the graph
 * cohesion metrics next to [[PageRank]]'s centrality (near-dup graph
 * triangles measure how CLIQUE-LIKE duplicate clusters are: high
 * clustering = true duplicate families, low = chain-shaped borderline
 * matches worth auditing).
 *
 * Algorithm: canonicalize to distinct ordered edges (a < b), then the
 * standard two-join enumeration — (a,b) ⋈ (b,c) gives ordered wedges
 * a<b<c, a LEFT SEMI probe on (a,c) keeps the closed ones; every
 * triangle is found exactly once in its ordered form. Per-node counts
 * explode the triangle's three corners; the clustering coefficient is
 * 2·tri(v) / (deg(v)·(deg(v)−1)) in the repo's exact half-up 4-dp
 * integer idiom (0 for degree < 2).
 *
 * Scale shape: two shuffles on edge endpoints plus the semi-join —
 * work is Σ wedge counts (Σ deg²-bounded), the known cost of exact
 * triangle enumeration. The ordered-form canonicalization (each wedge
 * built only from its middle vertex's ordered adjacency) is what
 * keeps hub wedges from being counted from all three corners; for
 * adversarially skewed degree distributions, cap or sample hot
 * vertices upstream before calling.
 */
object Triangles {

  /** Per-node (node, degree, triangles, clustering) over ALL `nodes`
    * (isolated nodes report 0/0/0.0); `edges` (u, v) in any
    * orientation, duplicates and self-loops dropped. */
  def nodeMetrics(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val nodeCol = nodes.columns.head
    val u = edges.columns(0); val v = edges.columns(1)
    val e = edges.select(least(col(u), col(v)).as("a"),
        greatest(col(u), col(v)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    val tris = wedges.join(e.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    nodes.select(col(nodeCol).as("node"))
      .join(deg, Seq("node"), "left")
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          expr("(2 * (2 * triangles) * 10000 + degree * (degree - 1)) " +
            "DIV (2 * degree * (degree - 1))") / 10000.0)
          .otherwise(lit(0.0)))
  }
}
