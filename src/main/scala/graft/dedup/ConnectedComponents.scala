package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list — the step that turns
 * pairwise near-duplicate matches into dedup CLUSTERS (keep one
 * representative per component).
 *
 * Implementation: alternating large-star / small-star (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
 * rewires edges toward the per-neighborhood minimum:
 *
 *   - large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
 *   - small-star(u): over edges oriented u > v, m = min(N(u));
 *     emit (v, m) for all v ∈ N(u) plus (u, m)
 *
 * The edge set converges to a star forest rooted at each component's
 * minimum node id in O(log² n) rounds (vs graph-diameter rounds for plain
 * min-label propagation), and every round is edge-proportional work:
 * a hash aggregation for the per-node minimum, a co-partitioned join to
 * rewire, and a distinct. High-degree nodes are exactly what large-star
 * flattens, so skew self-heals instead of accumulating. Each round is
 * localCheckpoint'ed: lineage (and optimizer time) stays O(1) per round
 * instead of growing with the iteration count.
 *
 * Only edge-touched nodes enter the loop; isolated nodes (the vast
 * majority in a near-duplicate corpus) are unioned back at the end with
 * their own id as label — keeping them inside the loop would multiply
 * every shuffle by corpus/edge_nodes for rows whose label never moves.
 */
object ConnectedComponents {

  /** min(N(u) ∪ {u}) per node over the symmetrized edge list, then rewire
    * every strictly-larger neighbor to that minimum. Output edges are
    * oriented (big, small). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Over edges oriented u > v: attach every small neighbor (and u
    * itself) to the minimum small neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = or.groupBy("u").agg(min("v").as("m"))
    or.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .unionAll(mins.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** (edge count, order-free fingerprint) — equal signatures on the
    * distinct edge set mean the round was a fixpoint. */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Label every node (from `nodes`, one column) with the minimum node id
    * reachable through `edges` (aCol, bCol). Output: (node, component);
    * isolated nodes label themselves.
    *
    * If the star-contraction loop hits `maxIter` before the fixpoint
    * (needs ~log²(n) rounds; 20 covers any realistic graph), labels are
    * APPROXIMATE upper bounds: a warning is logged and one extra
    * pointer-jump pass compresses remaining two-level chains, but deep
    * unconverged chains may still split one true component into several.
    * Raise `maxIter` if the warning ever fires in production. */
  def label(nodes: DataFrame, edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val nodeCol = nodes.columns.head
    val allNodes = nodes.select(col(nodeCol).as("node")).distinct()

    var e = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint() // eager: truncate lineage before the loop
    var sig = signature(e)
    var converged = sig._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      i += 1
    }
    // converged star forest: children point at the component root (the
    // minimum id); roots appear only on the small side.
    var touched = e.select(col("u").as("node"), col("v").as("component"))
      .unionByName(e.select(col("v").as("node"), col("v").as("component")))
      .groupBy("node").agg(min("component").as("component"))
    if (!converged) {
      log.warn(s"connected components did not converge in $maxIter rounds " +
        "(edge signature still moving) — emitted labels are upper bounds, " +
        "compressed by one extra pointer-jump pass; raise maxIter")
      // node -> label(label(node)): compresses any two-level chain the
      // truncated loop left behind (roots label themselves, so the
      // self-join is total and monotone non-increasing).
      val parents = touched
        .select(col("node").as("component"), col("component").as("grand"))
      touched = touched.join(parents, Seq("component"), "left")
        .select(col("node"),
          coalesce(col("grand"), col("component")).as("component"))
    }
    val isolated = allNodes
      .join(touched.select("node"), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    touched.unionByName(isolated)
  }

  /**
   * INCREMENTAL labeling — fold a new edge epoch into existing labels
   * without revisiting historical edges: prior labels compress each
   * old component into a STAR (node → component edges preserve old
   * connectivity exactly, and min-label roots keep the global-minimum
   * property), so labeling the union (label stars ∪ new epoch edges)
   * over the grown node set equals the batch labels over ALL edges
   * ever seen — the `incremental ≡ batch` contract, gated by the
   * unchanged batch oracle. Per-epoch cost is proportional to
   * (labeled nodes + epoch edges), NOT the historical edge count —
   * at 100 TB the daily increment relabels against the O(corpus)
   * label relation instead of re-deriving O(history) candidate pairs.
   */
  def labelIncremental(prevLabels: DataFrame, newNodes: DataFrame,
      newEdges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val labelEdges = prevLabels
      .filter(col("node") =!= col("component"))
      .select(col("node").as(aCol), col("component").as(bCol))
    val nodes = prevLabels.select("node")
      .unionByName(newNodes.select(col(newNodes.columns.head).as("node")))
      .distinct()
    label(nodes,
      labelEdges.unionByName(newEdges.select(col(aCol), col(bCol))),
      aCol, bCol, maxIter)
  }
}
