package graft

import graft.embeddings.{Opq, ProductQuantization}
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("learned rotation is orthonormal; alternation does not worsen the objective it minimizes") {
    val model = Opq.train(emb, "embedding", "vec_id", m = 8, ksub = 16,
      alternations = 1)
    val d = model.d
    // R Rᵀ = I to fp tolerance (U and V are both Gram–Schmidt outputs)
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(l => model.r(i)(l) * model.r(j)(l)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"RRt[$i][$j] = $dot")
    }
  }

  test("reconstruction error beats plain PQ and recall@k is at least PQ's on the demo corpus") {
    val queries = emb.filter(col("vec_id") <
      graft.embeddings.EmbeddingOps.DemoQueryCount)
    val cb = ProductQuantization.trainedCodebook(emb, "embedding",
      "vec_id", m = 8, ksub = 16)
    val pq = ProductQuantization.recallAtK(queries, emb, "embedding",
      "vec_id", k = 5, cb, m = 8, ksub = 16).head()
    val model = Opq.train(emb, "embedding", "vec_id", m = 8, ksub = 16,
      alternations = 1)
    val opq = Opq.recallAtK(queries, emb, "embedding", "vec_id", k = 5,
      model).head()
    val (pqErr, opqErr) = (pq.getAs[Double]("mean_abs_err"),
      opq.getAs[Double]("mean_abs_err"))
    val (pqRec, opqRec) = (pq.getAs[Double]("recall_at_k"),
      opq.getAs[Double]("recall_at_k"))
    info(s"PQ err $pqErr recall $pqRec | OPQ err $opqErr recall $opqRec")
    assert(opqErr <= pqErr,
      s"OPQ reconstruction error $opqErr must not exceed plain PQ $pqErr")
    assert(opqRec >= pqRec,
      s"OPQ recall $opqRec must be at least plain PQ $pqRec")
  }

  test("production path: rerank cosines are the exact float values; full-probe recall >= plain OPQ ADC") {
    val queries = emb.filter(col("vec_id") <
      graft.embeddings.EmbeddingOps.DemoQueryCount)
    val model = Opq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    val path = java.nio.file.Files.createTempDirectory("opqprod").toString
    val cents = Opq.writeProductionIndex(emb, "embedding", "vec_id",
      model, nlist = 8, path)
    // probe EVERY cell: the candidate set covers the whole corpus, so
    // the exact-float refine can only match or beat the rotated ADC
    val prod = Opq.productionTopKFromIndex(queries, path, emb,
      "embedding", "vec_id", k = 5, nprobe = 8, model, cents,
      rerankK = 50)
    val exact = graft.embeddings.EmbeddingOps.bruteForceTopK(queries,
      emb, "embedding", "vec_id", 5).select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      exact.join(df.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
    val adc = Opq.adcTopK(queries, emb, "embedding", "vec_id", 5, model)
    info(s"hits: production ${recall(prod)} vs rotated ADC ${recall(adc)}")
    assert(recall(prod) >= recall(adc),
      "exact-float refine over the full probe must not lose recall")
    // every returned cosine is the ORIGINAL-space exact value —
    // recomputed independently from the raw parquet rows
    val raw = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    prod.collect().foreach { r =>
      val (q, nb) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val (a, b) = (raw(q), raw(nb))
      val cos = a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(r.getAs[Double]("cosine") - cos) < 5e-5,
        s"pair ($q,$nb): ${r.getAs[Double]("cosine")} vs exact $cos")
    }
  }

  test("driver objective is non-increasing across alternations on the training sample") {
    // the Procrustes step minimizes ||R x − c|| for FIXED codes and the
    // Lloyd step minimizes it for a FIXED rotation — more alternations
    // must not increase the sample reconstruction error materially
    val m0 = Opq.train(emb, "embedding", "vec_id", m = 8, ksub = 16,
      alternations = 1)
    val m2 = Opq.train(emb, "embedding", "vec_id", m = 8, ksub = 16,
      alternations = 2)
    def sampleErr(model: Opq.Model): Double = {
      val rows = emb.select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("hk", md5(col("id").cast("string")))
        .orderBy("hk", "id").limit(4096).select("v").collect()
        .map { r =>
          val v = r.getSeq[Double](0).toArray
          val n0 = math.sqrt(v.map(x => x * x).sum)
          val n = if (n0 == 0.0) 1.0 else n0
          val u = v.map(_ / n)
          model.r.map(row => row.zip(u).map { case (a, b) => a * b }.sum)
        }
      Opq.reconError(rows, model.cb, model.m, model.ksub)
    }
    val (e1, e2) = (sampleErr(m0), sampleErr(m2))
    info(s"sample MSE after 1 alt $e1, after 2 alts $e2")
    assert(e2 <= e1 * 1.02, s"alternation must not regress: $e1 -> $e2")
  }
}
