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

  test("persisted SQ8 index serves results identical to in-memory IVF+SQ8") {
    val path = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    val emb = Demo.table(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < EmbeddingOps.DemoQueryCount)
    val cents = EmbeddingOps.ivfCentroids(emb, "embedding", "vec_id", 8)
    graft.embeddings.Quantization.writeIvfSq8Index(
      emb, "embedding", "vec_id", nlist = 8, path, Some(cents))
    // the layout stores codes + scale, never the float vectors
    val schema = spark.read.parquet(path).schema.fieldNames.toSet
    assert(schema == Set("vec_id", "scale", "q", "cluster"), schema)
    val fromIndex = graft.embeddings.Quantization.ivfSq8TopKFromIndex(
      queries, path, "embedding", "vec_id", k = 5, nprobe = 2, cents)
      .orderBy("query_id", "rank").collect()
    val inMemory = graft.embeddings.Quantization.ivfQuantizedTopK(
      queries, emb, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2,
      Some(cents))
      .orderBy("query_id", "rank").collect()
    assert(fromIndex.nonEmpty &&
      fromIndex.map(_.toString).toSeq == inMemory.map(_.toString).toSeq)
  }

  test("persisted PQ index serves results identical to in-memory IVF+PQ") {
    val path = java.nio.file.Files.createTempDirectory("graft-pqi").toString
    val emb = Demo.table(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < EmbeddingOps.DemoQueryCount)
    val cents = EmbeddingOps.ivfCentroids(emb, "embedding", "vec_id", 8)
    val cb = graft.embeddings.ProductQuantization.demoCodebook(
      emb, "embedding", "vec_id", m = 8, ksub = 16)
    graft.embeddings.ProductQuantization.writeIvfPqIndex(
      emb, "embedding", "vec_id", nlist = 8, path, cb, m = 8, ksub = 16,
      Some(cents))
    // 8 codes per vector and nothing else — the 32x-compressed layout
    val idx = spark.read.parquet(path)
    assert(idx.schema.fieldNames.toSet == Set("vec_id", "codes", "cluster"))
    assert(idx.select(org.apache.spark.sql.functions.size(col("codes")))
      .distinct().collect().map(_.getInt(0)).toSeq == Seq(8))
    val fromIndex = graft.embeddings.ProductQuantization.ivfPqTopKFromIndex(
      queries, path, "embedding", "vec_id", k = 5, nprobe = 2, cb,
      ksub = 16, cents)
      .orderBy("query_id", "rank").collect()
    val inMemory = graft.embeddings.ProductQuantization.ivfPqTopK(
      queries, emb, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2,
      cb, m = 8, ksub = 16, Some(cents))
      .orderBy("query_id", "rank").collect()
    assert(fromIndex.nonEmpty &&
      fromIndex.map(_.toString).toSeq == inMemory.map(_.toString).toSeq)
  }

  test("from-index rerank equals in-memory rerank (full production path)") {
    val path = java.nio.file.Files.createTempDirectory("graft-prod").toString
    val emb = Demo.table(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < EmbeddingOps.DemoQueryCount)
    val cents = EmbeddingOps.kmeansCentroids(emb, "embedding", "vec_id",
      nlist = 8)
    val cb = graft.embeddings.ProductQuantization.trainedCodebook(
      emb, "embedding", "vec_id", m = 8, ksub = 16)
    graft.embeddings.ProductQuantization.writeIvfPqIndex(
      emb, "embedding", "vec_id", nlist = 8, path, cb, m = 8, ksub = 16,
      Some(cents))
    val fromIndex = graft.embeddings.ProductQuantization
      .ivfPqRerankTopKFromIndex(queries, path, emb, "embedding", "vec_id",
        k = 5, nprobe = 2, cb, ksub = 16, cents, rerankK = 50)
      .orderBy("query_id", "rank").collect()
    val inMemory = graft.embeddings.ProductQuantization.ivfPqRerankTopK(
      queries, emb, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2,
      cb, m = 8, ksub = 16, rerankK = 50, Some(cents))
      .orderBy("query_id", "rank").collect()
    assert(fromIndex.nonEmpty &&
      fromIndex.map(_.toString).toSeq == inMemory.map(_.toString).toSeq)
    // the rerank stage re-scores in float: cosine values must come from
    // the exact vectors, not the PQ reconstructions
    assert(fromIndex.forall(r => !r.schema.fieldNames.contains("cosine_pq")))
  }

  test("SQ8/PQ probe joins prune persisted index partitions dynamically") {
    val emb = Demo.table(spark, sf(), "embeddings")
    val cents = EmbeddingOps.ivfCentroids(emb, "embedding", "vec_id", 8)
    val oneQuery = emb.filter(col("vec_id") === 0)
    def assertPruned(plan: String): Unit =
      assert(plan.contains("dynamicpruning") ||
        plan.contains("DynamicPruning") ||
        plan.contains("PartitionFilters: [isnotnull(cluster"),
        s"no partition pruning on the index scan:\n$plan")

    val sq8Path = java.nio.file.Files.createTempDirectory("graft-sq8p").toString
    graft.embeddings.Quantization.writeIvfSq8Index(
      emb, "embedding", "vec_id", nlist = 8, sq8Path, Some(cents))
    val sq8 = graft.embeddings.Quantization.ivfSq8TopKFromIndex(
      oneQuery, sq8Path, "embedding", "vec_id", k = 3, nprobe = 2, cents)
    sq8.collect()
    assertPruned(sq8.queryExecution.executedPlan.toString)

    val pqPath = java.nio.file.Files.createTempDirectory("graft-pqp").toString
    val cb = graft.embeddings.ProductQuantization.demoCodebook(
      emb, "embedding", "vec_id", m = 8, ksub = 16)
    graft.embeddings.ProductQuantization.writeIvfPqIndex(
      emb, "embedding", "vec_id", nlist = 8, pqPath, cb, m = 8, ksub = 16,
      Some(cents))
    val pq = graft.embeddings.ProductQuantization.ivfPqTopKFromIndex(
      oneQuery, pqPath, "embedding", "vec_id", k = 3, nprobe = 2, cb,
      ksub = 16, cents)
    pq.collect()
    assertPruned(pq.queryExecution.executedPlan.toString)
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
