package graft

import graft.embeddings.EmbeddingOps
import org.apache.spark.sql.functions._

class EmbeddingIndexSpec extends SparkSpec {

  test("persisted IVF index serves identical results to in-memory ivfTopK") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val emb = Demo.table(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < EmbeddingOps.DemoQueryCount)
    EmbeddingOps.writeIvfIndex(emb, "embedding", "vec_id", nlist = 8, path)
    val fromIndex = EmbeddingOps.ivfTopKFromIndex(queries, path, emb,
      "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    val inMemory = EmbeddingOps.ivfTopK(queries, emb, "embedding", "vec_id",
      k = 5, nlist = 8, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(fromIndex.length == inMemory.length && fromIndex.nonEmpty)
    assert(fromIndex.map(_.toString).toSeq == inMemory.map(_.toString).toSeq)
  }

  test("probe join prunes index partitions dynamically") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    val emb = Demo.table(spark, sf(), "embeddings")
    EmbeddingOps.writeIvfIndex(emb, "embedding", "vec_id", nlist = 8, path)
    // a single query probes nprobe=2 of the 8 cluster directories
    val oneQuery = emb.filter(col("vec_id") === 0)
    val served = EmbeddingOps.ivfTopKFromIndex(oneQuery, path, emb,
      "embedding", "vec_id", k = 3, nlist = 8, nprobe = 2)
    served.collect()
    // the index scan must carry a dynamic-pruning (or pushed-in) filter
    // on the cluster partition column rather than reading all directories
    val planStr = served.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning") ||
      planStr.contains("DynamicPruning") ||
      planStr.contains("PartitionFilters: [isnotnull(cluster"),
      s"no partition pruning on the index scan:\n$planStr")
  }
}
