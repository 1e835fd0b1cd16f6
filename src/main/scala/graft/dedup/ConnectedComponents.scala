package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list by iterative
 * min-label propagation — the step that turns pairwise near-duplicate
 * matches into dedup CLUSTERS (keep one representative per component).
 *
 * Each iteration joins the current labels across edges (both directions)
 * and takes the minimum seen label per node; fixpoint when no label
 * changes. Iterations needed ≈ graph diameter; near-dup graphs are
 * overwhelmingly tiny cliques/chains, so 3-5 rounds converge in practice
 * and `maxIter` bounds pathological chains. Each round is one
 * shuffle-join + one aggregation over (node, label) pairs — no driver
 * materialization, and intermediate label relations are persisted and
 * released round-to-round (the standard large-graph-on-DataFrames loop;
 * for billion-edge graphs swap in large-star/small-star, same skeleton).
 */
object ConnectedComponents {

  /** Label every node (from `nodes`, one column) with the minimum node id
    * reachable through `edges` (aCol, bCol). Output: (node, component);
    * isolated nodes label themselves. */
  def label(nodes: DataFrame, edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val nodeCol = nodes.columns.head
    // symmetric edge list
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only nodes touching an edge can ever change label: iterate over
    // those, and union the (overwhelmingly more numerous) isolated nodes
    // back in at the end with their own id. In a near-duplicate graph
    // edge-touched nodes are a few percent of the corpus — keeping the
    // rest inside the loop would multiply every per-iteration shuffle by
    // corpus/edge_nodes for rows whose label provably never moves.
    val allNodes = nodes.select(col(nodeCol).as("node")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var persisted = sym.select(col("u").as("node"))
      .distinct()
      .withColumn("component", col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = persisted
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // neighbor labels: for each node u, the labels of its neighbors v.
      // The node's own row is tagged so the aggregation can emit both the
      // new label (min over self + neighbors) and the old one (the self
      // row) in a single pass — the convergence check then needs no
      // second join against the previous labels.
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u").as("node"), col("component"), lit(false).as("self"))
      val step = labels
        .select(col("node"), col("component"), lit(true).as("self"))
        .unionByName(viaNeighbors)
        .groupBy("node").agg(
          min(col("component")).as("component"),
          min(when(col("self"), col("component"))).as("_old"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // limit-1 existence check: cheaper than a full count, and the
      // persisted step is materialized by next iteration's consumers
      changed = if (step.filter(col("component") =!= col("_old")).isEmpty) 0 else 1
      persisted.unpersist()
      persisted = step
      labels = step.select("node", "component")
      i += 1
    }
    sym.unpersist()
    val isolated = allNodes
      .join(labels.select("node"), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    labels.unionByName(isolated)
  }
}
