package graft.embeddings

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Int8 scalar quantization for embedding columns — the storage/bandwidth
 * lever for ANN at corpus scale. A 100 TB embedding table shrinks ~4×
 * when the float32 vectors are stored as int8 codes + one float scale
 * per vector, and every shuffle in the LSH/IVF candidate joins moves 4×
 * fewer bytes. The reference pipeline has no embedding support at all;
 * this is part of the engine's training-data-pipeline surface.
 *
 * Scheme: symmetric per-vector max-abs quantization (the faiss
 * `ScalarQuantizer` QT_8bit_direct family / ONNX-style symmetric
 * linear quantization):
 *
 *   scale = max_i |v_i| / 127        (1.0 for the all-zero vector)
 *   q_i   = round(v_i / scale)       ∈ [-127, 127]
 *
 * Properties this engine leans on:
 *  - COSINE IS SCALE-FREE: cos(q_a·s_a, q_b·s_b) = cos(q_a, q_b), so
 *    quantized scoring needs only the int codes — the scales matter
 *    for reconstruction, not for similarity ranking.
 *  - Everything is deterministic IEEE arithmetic + HALF_UP rounding,
 *    identical in Spark and the DuckDB oracle (both round doubles half
 *    away from zero), so the codes are engine-exact and hash-checkable.
 *  - Quantization is a pure map-side projection (built-in higher-order
 *    functions, no UDF, no shuffle); dequantized scoring reuses the
 *    codegen'd dot kernel on the exactly-representable int values.
 */
object Quantization {

  private def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** Quantization step: maxabs/127, or 1.0 for the all-zero vector
    * (avoids a 0/0 NaN; the codes are all zero either way). */
  private def scaleOf(m: Column): Column =
    when(m === 0d, lit(1d)).otherwise(m / 127d)

  private def codesOf(v: Column, scale: Column): Column =
    transform(v, x => round(x / scale).cast("int"))

  /** Per-vector symmetric int8 codes: (vec_id, scale, q). */
  def quantize(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("vec_id"), v.as("v"))
      .withColumn("scale", scaleOf(maxAbs(col("v"))))
      .select(col("vec_id"), col("scale"),
        codesOf(col("v"), col("scale")).as("q"))
  }

  /** Quantized codes widened for scoring: vec_id, scale, qd (codes as
    * doubles — int8 values are exactly representable), qn (L2 norm of
    * the codes). Materialized once for the multi-consumer joins. */
  private def scored(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    graft.operators.Materialized(
      quantize(df, vecCol, idCol)
        .withColumn("qd", col("q").cast("array<double>"))
        .withColumn("qn", EmbeddingOps.norm(col("qd")))
        .select("vec_id", "scale", "qd", "qn"))

  /**
   * Exact top-k over the QUANTIZED codes (cosine of int8 code vectors;
   * scales cancel — see object doc). Brute-force |Q|×|C| like
   * [[EmbeddingOps.bruteForceTopK]]; at corpus scale the codes drop
   * into the same LSH/IVF candidate structures with 4× smaller
   * payloads — this is the correctness anchor for that path.
   */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = scored(corpus, vecCol, idCol)
      .select(col("vec_id").as("neighbor_id"), col("qd").as("cv"),
        col("qn").as("cn"))
    val q = scored(queries, vecCol, idCol)
      .select(col("vec_id").as("query_id"), col("qd").as("qv"),
        col("qn").as("qn_q"))
    val pairs = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(EmbeddingOps.dot(col("qv"), col("cv")) /
          (col("qn_q") * col("cn")), 4).as("cosine_q"))
    graft.operators.Relational.topKPerGroup(pairs,
      Seq("query_id"), Seq(desc("cosine_q"), asc("neighbor_id")), k)
  }

  /**
   * IVF + SQ8 top-k — the production ANN shape (faiss "IVF,SQ8"): the
   * corpus is partitioned by nearest coarse centroid AND stored as int8
   * codes; queries probe their nprobe cells with the FLOAT vector and
   * score asymmetrically against the codes (ADC — cosine is scale-free,
   * so dequantization is free, see object doc). Relative to
   * [[EmbeddingOps.ivfTopK]] the probe join moves 4×-smaller corpus
   * payloads; relative to [[quantizedTopK]] only the probed cells are
   * scored. At 100 TB this is the layout [[EmbeddingOps.writeIvfIndex]]
   * would persist with `q`+`scale` instead of the float column.
   */
  def ivfQuantizedTopK(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int, nlist: Int, nprobe: Int,
      centroids: Option[Array[(Long, Array[Double], Double)]] = None)
      : DataFrame = {
    val cents = centroids.getOrElse(
      EmbeddingOps.ivfCentroids(corpus, vecCol, idCol, nlist))
    // One map-side projection builds the whole index row: coarse cell
    // (flat-matrix kernel) + int8 codes + code norm.
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("cluster", EmbeddingOps.ivfAssignment(col("v"), cents))
      .withColumn("scale", scaleOf(maxAbs(col("v"))))
      .withColumn("cd", codesOf(col("v"), col("scale")).cast("array<double>"))
      .withColumn("cn", EmbeddingOps.norm(col("cd")))
      .select("cluster", "neighbor_id", "cd", "cn")
    val probing = EmbeddingOps.prepared(queries, vecCol, idCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(EmbeddingOps.ivfProbes(col("v"), cents, nprobe))
          .as("cluster"))
    val scored = probing.join(c, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(EmbeddingOps.dot(col("qv"), col("cd")) /
          (col("qn") * col("cn")), 4).as("cosine_adc"))
    graft.operators.Relational.topKPerGroup(scored,
      Seq("query_id"), Seq(desc("cosine_adc"), asc("neighbor_id")), k)
  }

  /**
   * Persist the corpus as an IVF + SQ8 index: one parquet directory per
   * coarse cluster, each row carrying the int8 codes and the per-vector
   * scale INSTEAD of the float vector — the ~4×-smaller on-disk layout
   * the `ivfQuantizedTopK` doc promises ("the layout writeIvfIndex
   * would persist"). At 100 TB of float32 embeddings the persisted
   * index is ~25 TB, and a query batch's probe join reads only its
   * nprobe cluster directories (dynamic partition pruning, asserted in
   * EmbeddingIndexSpec).
   */
  def writeIvfSq8Index(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, path: String,
      centroids: Option[Array[(Long, Array[Double], Double)]] = None): Unit = {
    val cents = centroids.getOrElse(
      EmbeddingOps.ivfCentroids(corpus, vecCol, idCol, nlist))
    graft.io.ParquetSink.writePartitioned(
      indexRows(corpus, vecCol, idCol, cents), path, Seq("cluster"))
  }

  /** The SQ8 index row relation: (cluster, vec_id, scale, q) — ONE
    * map-side projection (coarse cell via the flat centroid-matrix
    * kernel + int8 codes). Shared by [[writeIvfSq8Index]] and the
    * streaming SemDeDup index ([[SemanticDedup.corpusIndex]]). */
  private[embeddings] def indexRows(corpus: DataFrame, vecCol: String,
      idCol: String,
      cents: Array[(Long, Array[Double], Double)]): DataFrame =
    corpus
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cluster", EmbeddingOps.ivfAssignment(col("v"), cents))
      .withColumn("scale", scaleOf(maxAbs(col("v"))))
      .select(col("cluster"), col("vec_id"), col("scale"),
        codesOf(col("v"), col("scale")).as("q"))

  /** Serve IVF+SQ8 top-k from a persisted [[writeIvfSq8Index]] layout:
    * float queries probe their nprobe cells (same centroids the index
    * was written with), the scan reads ONLY the probed cluster
    * directories, and ADC scoring runs on the stored codes — value-
    * identical to the in-memory [[ivfQuantizedTopK]] (cosine is
    * scale-free, so the stored scale is not even read here; it exists
    * for reconstruction consumers). */
  def ivfSq8TopKFromIndex(queries: DataFrame, indexPath: String,
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      cents: Array[(Long, Array[Double], Double)]): DataFrame = {
    val spark = queries.sparkSession
    val index = spark.read.parquet(indexPath)
      .select(col("cluster"), col("vec_id").as("neighbor_id"),
        col("q").cast("array<double>").as("cd"))
      .withColumn("cn", EmbeddingOps.norm(col("cd")))
    val probing = EmbeddingOps.prepared(queries, vecCol, idCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(EmbeddingOps.ivfProbes(col("v"), cents, nprobe))
          .as("cluster"))
    val scored = probing.join(index, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(EmbeddingOps.dot(col("qv"), col("cd")) /
          (col("qn") * col("cn")), 4).as("cosine_adc"))
    graft.operators.Relational.topKPerGroup(scored,
      Seq("query_id"), Seq(desc("cosine_adc"), asc("neighbor_id")), k)
  }

  /**
   * Quality report for the quantized index: recall@k of the quantized
   * top-k against the exact float top-k, plus the mean absolute
   * reconstruction error — ONE summary row
   * (k, n_queries, recall_at_k, mean_abs_err). The metric a user
   * checks before switching an ANN serving path to int8 codes.
   */
  def recallAtK(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val exact = EmbeddingOps.bruteForceTopK(queries, corpus,
      vecCol, idCol, k).select("query_id", "neighbor_id")
    val quant = quantizedTopK(queries, corpus, vecCol, idCol, k)
      .select("query_id", "neighbor_id")
    // Integer hit counts, ONE double division at the end — a running
    // double avg would be partition-order-dependent (same discipline as
    // the decimal-summed TF-IDF/BM25 scores).
    val recall = exact.join(quant, Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("total_hits"))
      .crossJoin(exact.agg(
        countDistinct(col("query_id")).as("n_queries")))
      .select(col("n_queries"),
        round(col("total_hits").cast("double") /
          (col("n_queries") * k), 4).as("recall_at_k"))
    // Reconstruction error over the corpus: mean |v_i − q_i·scale|.
    // Per-element rounding is deterministic; the decimal sum is exact
    // and commutative, so the mean is engine- and partitioning-exact.
    val err = quantize(corpus, vecCol, idCol)
      .join(corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v")), "vec_id")
      .select(explode(zip_with(col("v"), col("q"),
        (x, qi) => abs(x - qi.cast("double") * col("scale")))).as("e"))
      .select(round(col("e"), 9).cast("decimal(28,9)").as("e9"))
      .agg(round(sum(col("e9")).cast("double") / count(lit(1)), 6)
        .as("mean_abs_err"))
    recall.crossJoin(err).select(lit(k).as("k"), col("n_queries"),
      col("recall_at_k"), col("mean_abs_err"))
  }
}
