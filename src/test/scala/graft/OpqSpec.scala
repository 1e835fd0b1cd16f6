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
