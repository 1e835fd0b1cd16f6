package graft

import graft.embeddings.{EmbeddingOps, Quantization, SemanticDedup}
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup + int8 scalar quantization. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Demo.table(spark, sf(), "embeddings")

  // Two tight synthetic clusters around orthogonal directions, each with
  // a planted near-duplicate pair, plus one isolated vector.
  private def planted = Seq(
    (0L, Array(1.00f, 0.01f, 0f, 0f)), // cluster A seed (centroid 0)
    (1L, Array(0.01f, 1.00f, 0f, 0f)), // cluster B seed (centroid 1)
    (10L, Array(0.99f, 0.02f, 0f, 0f)), // A: near-dup of 11
    (11L, Array(0.98f, 0.03f, 0f, 0f)),
    (20L, Array(0.02f, 0.99f, 0f, 0f)), // B: near-dup of 21
    (21L, Array(0.03f, 0.98f, 0f, 0f)),
    (30L, Array(0f, 0f, 1f, 0f))) // isolated direction
    .toDF("vec_id", "embedding")

  test("semdedup pairs: intra-cluster near-dups found, cross-cluster excluded") {
    val df = planted
    val cents = EmbeddingOps.ivfCentroids(df, "embedding", "vec_id", 2)
    val pairs = SemanticDedup.pairs(df, "embedding", "vec_id", cents,
      threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // All A-side vectors are mutually ≥0.95 (they hug the same axis);
    // no pair may span the two clusters.
    assert(pairs.contains((10L, 11L)))
    assert(pairs.contains((20L, 21L)))
    assert(pairs.forall { case (a, b) =>
      (Set(0L, 10L, 11L).contains(a) && Set(0L, 10L, 11L).contains(b)) ||
        (Set(1L, 20L, 21L).contains(a) && Set(1L, 20L, 21L).contains(b))
    }, s"cross-cluster pair in $pairs")
  }

  test("semdedup keepers: one survivor per dup group, farthest-from-centroid wins") {
    val df = planted
    val cents = EmbeddingOps.ivfCentroids(df, "embedding", "vec_id", 2)
    val k = SemanticDedup.keepers(df, "embedding", "vec_id", cents,
      threshold = 0.95)
    val kept = k.filter(col("is_kept")).select("vec_id")
      .as[Long].collect().toSet
    val all = k.select("vec_id").as[Long].collect().toSet
    assert(all == Set(0L, 1L, 10L, 11L, 20L, 21L, 30L)) // verdict per vector
    assert(kept.contains(30L)) // isolated vector always survives
    // Exactly one survivor among each mutually-similar group: the
    // member with the LOWEST rounded centroid cosine survives.
    val ccos = k.select(col("vec_id"), col("centroid_cos"))
      .as[(Long, Double)].collect().toMap
    for (group <- Seq(Set(0L, 10L, 11L), Set(1L, 20L, 21L))) {
      val pairsAbove = for {
        a <- group; b <- group if a < b
      } yield (a, b)
      // group members here are all mutually ≥ .95 by construction
      val survivors = kept.intersect(group)
      assert(survivors.size == 1, s"group $group kept $survivors")
      val want = group.minBy(id => (ccos(id), id))
      assert(survivors.head == want,
        s"group $group kept ${survivors.head}, want $want (ccos=$ccos)")
      assert(pairsAbove.nonEmpty)
    }
  }

  test("semdedup: deterministic across partitionings; maxCluster drops mega-clusters") {
    val cents = EmbeddingOps.ivfCentroids(emb, "embedding", "vec_id", 8)
    val a = SemanticDedup.pairs(emb, "embedding", "vec_id", cents, 0.45)
      .select("id_a", "id_b", "cosine").collect().toSet
    val b = SemanticDedup.pairs(emb.repartition(7), "embedding", "vec_id",
      cents, 0.45).select("id_a", "id_b", "cosine").collect().toSet
    assert(a == b && a.nonEmpty)
    // A 1-vector cap drops every cluster → no pairs, but keepers still
    // report every vector (all kept: nothing can dominate).
    val none = SemanticDedup.pairs(emb, "embedding", "vec_id", cents, 0.45,
      maxCluster = 1L)
    assert(none.count() == 0)
    val k = SemanticDedup.keepers(emb, "embedding", "vec_id", cents, 0.45,
      maxCluster = 1L)
    assert(k.count() == emb.count())
    assert(k.filter(!col("is_kept")).count() == 0)
  }

  test("semdedup pairs subset exact cosine pairs; keepers consistent with pairs") {
    val cents = EmbeddingOps.ivfCentroids(emb, "embedding", "vec_id", 8)
    val sem = SemanticDedup.pairs(emb, "embedding", "vec_id", cents, 0.45)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)]
      .collect().toSet
    val exact = EmbeddingOps.cosinePairs(emb, "embedding", "vec_id", 0.45)
      .as[(Long, Long, Double)].collect().toSet
    assert(sem.subsetOf(exact), s"semdedup reported a non-pair: ${sem.diff(exact)}")
    // every reported dup pair loses at least one member
    val kept = SemanticDedup.keepers(emb, "embedding", "vec_id", cents, 0.45)
      .filter(col("is_kept")).select("vec_id").as[Long].collect().toSet
    sem.foreach { case (a, b, _) =>
      assert(!(kept.contains(a) && kept.contains(b)),
        s"pair ($a,$b) fully survived")
    }
  }

  test("semantic decontamination: bench probing recovers the cross-cell leak nprobe=1 misses") {
    // centroids: e1 (cell 0) and e2 (cell 1). The train vector hugs e2
    // (cell 1); the bench vector sits between the axes — NEAREST cell 0,
    // second-nearest cell 1 — and is cosine 0.761 to the train vector.
    // Single-cell pairing (nprobe=1) looks only in cell 0 and misses
    // the leak; the bench side probing its 2 nearest cells finds it.
    val train = Seq(
      (0L, Array(1.00f, 0.00f, 0f, 0f)),
      (1L, Array(0.00f, 1.00f, 0f, 0f)),
      (100L, Array(0.10f, 0.99f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val bench = Seq((500L, Array(0.72f, 0.69f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = EmbeddingOps.ivfCentroids(train, "embedding", "vec_id", 2)
    def pairsAt(np: Int) = SemanticDedup.semanticContaminationPairs(
      train, bench, "embedding", "vec_id", cents, threshold = 0.75,
      nprobe = np)
      .select("vec_id", "bench_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(pairsAt(1) === Seq(), "nprobe=1 must miss the cross-cell pair")
    assert(pairsAt(2) === Seq((100L, 500L, 0.761)))
    // the decontaminated corpus drops exactly the leaked vector
    val kept = SemanticDedup.decontaminateSemantic(train, bench,
      "embedding", "vec_id", cents, threshold = 0.75, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(0L, 1L))
  }

  test("semantic decontamination report: per-bench leak counts hand-checked") {
    val train = Seq(
      (0L, Array(1.00f, 0.00f, 0f, 0f)),
      (1L, Array(0.00f, 1.00f, 0f, 0f)),
      (10L, Array(0.99f, 0.02f, 0f, 0f)), // 0.9998 to bench 100
      (11L, Array(0.98f, 0.04f, 0f, 0f))) // 0.9992 to bench 100
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Array(1.00f, 0.00f, 0f, 0f)), // leaked twice
      (200L, Array(0f, 0f, 1f, 0f)))       // clean direction: no leak
      .toDF("vec_id", "embedding")
    val cents = EmbeddingOps.ivfCentroids(train, "embedding", "vec_id", 2)
    val rep = SemanticDedup.semanticContaminationReport(train, bench,
      "embedding", "vec_id", cents, threshold = 0.95)
      .orderBy("bench_id").collect()
    // seed 0 (identical to bench 100) also leaks: n = 3, closest is
    // the exact copy at 1.0, first offender the smallest id
    assert(rep.length === 1)
    assert(rep(0).getLong(0) === 100L)
    assert(rep(0).getLong(1) === 3L)
    assert(rep(0).getDouble(2) === 1.0)
    assert(rep(0).getLong(3) === 0L)
    // determinism across partitionings (the pairing is join+filter,
    // no order dependence)
    val rep7 = SemanticDedup.semanticContaminationReport(
      train.repartition(7), bench, "embedding", "vec_id", cents,
      threshold = 0.95).orderBy("bench_id").collect()
    assert(rep7.map(_.toSeq).toSeq === rep.map(_.toSeq).toSeq)
  }

  test("nlistForCount tracks corpus size") {
    assert(SemanticDedup.nlistForCount(0) == 8)
    assert(SemanticDedup.nlistForCount(4096) == 8)
    assert(SemanticDedup.nlistForCount(512000) == 1000)
    assert(SemanticDedup.nlistForCount(Long.MaxValue) == 65536)
    // The static semdedup oracles bake in the verify corpus's cluster
    // count (500 vectors → centroids = vec_id < 8); a rule change must
    // break HERE, not as a silent hash mismatch in the driver gate.
    assert(SemanticDedup.nlistForCount(500) == 8)
  }

  // ───────────────────────── quantization ─────────────────────────

  test("quantize: codes in [-127,127], max element hits ±127, reconstruction within scale/2") {
    val q = Quantization.quantize(emb, "embedding", "vec_id")
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), "vec_id")
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val codes = r.getSeq[Int](r.fieldIndex("q"))
      val v = r.getSeq[Double](r.fieldIndex("v"))
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.map(math.abs).max == 127) // max-abs element maps to ±127
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"recon error ${math.abs(x - c * scale)} > ${scale / 2}")
      }
    }
  }

  test("quantize: all-zero vector gets scale 1.0 and zero codes") {
    val df = Seq((0L, Array(0f, 0f, 0f)), (1L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val rows = Quantization.quantize(df, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    assert(rows(0).getAs[Double]("scale") == 1.0)
    assert(rows(0).getSeq[Int](rows(0).fieldIndex("q")).forall(_ == 0))
    assert(rows(1).getSeq[Int](rows(1).fieldIndex("q")) == Seq(64, -127, 32))
  }

  test("quantized top-k: high overlap with exact float top-k") {
    val queries = emb.filter(col("vec_id") < 20)
    val rec = Quantization.recallAtK(queries, emb, "embedding", "vec_id", 5)
      .collect().head
    assert(rec.getAs[Long]("n_queries") == 20)
    val recall = rec.getAs[Double]("recall_at_k")
    assert(recall >= 0.9, s"int8 recall@5 $recall < 0.9")
    val err = rec.getAs[Double]("mean_abs_err")
    assert(err > 0 && err < 0.01, s"mean_abs_err $err")
  }

  test("IVF+SQ8 top-k: same cells as float IVF, near-identical ranking") {
    val queries = emb.filter(col("vec_id") < 20)
    val floatIvf = EmbeddingOps.ivfTopK(queries, emb, "embedding",
      "vec_id", k = 5, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq8 = Quantization.ivfQuantizedTopK(queries, emb, "embedding",
      "vec_id", k = 5, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(sq8.size == 100) // 20 queries × 5
    val overlap = floatIvf.intersect(sq8).size.toDouble / floatIvf.size
    assert(overlap >= 0.9, s"IVF+SQ8 vs float IVF overlap $overlap")
  }

  test("quantized top-k deterministic across partitionings") {
    val queries = emb.filter(col("vec_id") < 20)
    val a = Quantization.quantizedTopK(queries, emb, "embedding", "vec_id", 5)
      .collect().map(_.toSeq).toSet
    val b = Quantization.quantizedTopK(queries.repartition(5),
      emb.repartition(7), "embedding", "vec_id", 5)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 100)
  }
}
