package graft

import graft.embeddings.EmbeddingOps
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class EmbeddingTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Demo.table(spark, sf(), "embeddings")

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0))
      .toDF("a", "b", "want")
    val got = df.select(
      round(EmbeddingOps.cosine($"a".cast("array<double>"),
        $"b".cast("array<double>")), 6).as("got"), $"want").collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("random projection: deterministic, JL distance preservation in aggregate") {
    val proj = EmbeddingOps.randomProjection(emb, "embedding", "vec_id", 8)
    val rows = proj.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.values.forall(_.length == 8))
    // deterministic across partitionings
    val again = EmbeddingOps.randomProjection(emb.repartition(7),
      "embedding", "vec_id", 8).collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.keySet == again.keySet)
    assert(rows.forall { case (k, v) => v.sameElements(again(k)) })
    // JL property: squared distances preserved in AGGREGATE (mean ratio
    // near 1; individual pairs vary at outDim=8)
    val orig = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toArray.sorted.take(40)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      da = d2(orig(ids(i)), orig(ids(j))) if da > 1e-9
    } yield d2(rows(ids(i)), rows(ids(j))) / da
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.6, s"mean distance ratio $mean")
  }

  test("LSH pairs recall vs exact cosine pairs at threshold 0.45") {
    val exact = EmbeddingOps.cosinePairs(emb, "embedding", "vec_id", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = EmbeddingOps.lshCosinePairs(emb, "embedding", "vec_id", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh.diff(exact)}")
    // OR-amplified SRP-LSH is approximate; require non-trivial recall in
    // the 0.45 band and report the number
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      info(f"LSH recall at 0.45: $recall%.2f (${lsh.size}/${exact.size})")
      assert(recall >= 0.25, f"recall $recall%.2f too low")
    }
    // exact duplicates must always collide (identical sign patterns)
    val base = emb.select("vec_id", "embedding")
    val twin = base.limit(1).select(lit(9999L).as("vec_id"), col("embedding"))
    val dupPairs = EmbeddingOps.lshCosinePairs(base.unionByName(twin),
      "embedding", "vec_id", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.exists(_._2 == 9999L))
  }

  test("ann topk: rank 1 neighbour of a vector's twin is the twin") {
    val base = emb.select("vec_id", "embedding")
    val twin = base.limit(1).select(lit(9999L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twin)
    val top = EmbeddingOps.bruteForceTopK(
      corpus.filter($"vec_id" === 9999L), corpus, "embedding", "vec_id", 1)
      .collect()
    assert(top.length == 1)
    assert(top(0).getAs[Double]("cosine") == 1.0)
  }

  test("IVF topk: correct re-scores, high recall vs brute force") {
    val queries = emb.filter($"vec_id" < EmbeddingOps.DemoQueryCount)
    val ivf = EmbeddingOps.ivfTopK(queries, emb, "embedding", "vec_id",
      k = 5, nlist = 8, nprobe = 2).collect()
    val brute = EmbeddingOps.bruteForceTopK(queries, emb, "embedding",
      "vec_id", k = 5).collect()
    assert(ivf.nonEmpty)
    // IVF cosine for a pair must equal the exact cosine (same scoring)
    val bruteScores = brute.map(r => (r.getLong(0), r.getLong(1)) ->
      r.getDouble(2)).toMap
    ivf.foreach { r =>
      bruteScores.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(r.getDouble(2) === c)
      }
    }
    // recall@5: fraction of brute-force top-5 pairs recovered by IVF
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(r =>
      ivfPairs.contains((r.getLong(0), r.getLong(1)))).toDouble / brute.length
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.5)

    // Trained k-means centroids must not lose recall vs the id<nlist
    // stand-in, measured over the FULL corpus as queries: the demo query
    // set (ids 0..19) CONTAINS the stand-in centroids (ids 0..7), and a
    // query that is its own centroid probes its own cell where its
    // neighbors pile up — a self-probing bias that inflates the stand-in
    // to ~0.9 recall on those 8 queries while neutral queries see ~0.45.
    // Training must also be bit-deterministic run-to-run.
    val km = EmbeddingOps.kmeansCentroids(emb, "embedding", "vec_id", nlist = 8)
    val km2 = EmbeddingOps.kmeansCentroids(emb, "embedding", "vec_id", nlist = 8)
    assert(km.map(_._2.toSeq).toSeq === km2.map(_._2.toSeq).toSeq)
    val bruteAll = EmbeddingOps.bruteForceTopK(emb, emb, "embedding",
      "vec_id", k = 5).collect()
    def recallAll(cents: Option[Array[(Long, Array[Double], Double)]]): Double = {
      val pairs = EmbeddingOps.ivfTopK(emb, emb, "embedding", "vec_id",
        k = 5, nlist = 8, nprobe = 2, centroids = cents).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      bruteAll.count(r =>
        pairs.contains((r.getLong(0), r.getLong(1)))).toDouble / bruteAll.length
    }
    val standinAll = recallAll(None)
    val kmAll = recallAll(Some(km))
    info(s"all-corpus recall@5: stand-in = $standinAll, kmeans = $kmAll")
    assert(kmAll >= standinAll,
      s"kmeans recall $kmAll < stand-in $standinAll on unbiased queries")
  }

  test("hard negatives: labels always differ, nprobe=nlist equals label-filtered brute force") {
    val queries = emb.filter($"vec_id" < EmbeddingOps.DemoQueryCount)
    val mined = EmbeddingOps.ivfHardNegatives(queries, emb, "embedding",
      "vec_id", "label", k = 5, nlist = 8, nprobe = 2).collect()
    assert(mined.nonEmpty)
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    mined.foreach { r =>
      assert(r.getInt(1) == labels(r.getLong(0)))   // anchor_label correct
      assert(r.getInt(3) == labels(r.getLong(2)))   // neighbor_label correct
      assert(r.getInt(1) != r.getInt(3), "same-label pair ranked")
      assert(r.getLong(0) != r.getLong(2), "self pair ranked")
    }
    // per-anchor ranks dense from 1, cosine non-increasing
    mined.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to g.length))
      val cos = sorted.map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // probing EVERY cell makes IVF exact: must equal brute-force top-k
    // restricted to label-mismatched candidates
    val exact = EmbeddingOps.ivfHardNegatives(queries, emb, "embedding",
      "vec_id", "label", k = 5, nlist = 8, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4), r.getInt(5)))
    val bruteAll = EmbeddingOps.bruteForceTopK(queries, emb, "embedding",
      "vec_id", k = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bruteFiltered = bruteAll
      .filter { case (q, n, _) => labels(q) != labels(n) }
      .groupBy(_._1).toSeq.flatMap { case (q, g) =>
        g.sortBy { case (_, n, c) => (-c, n) }.take(5).zipWithIndex
          .map { case ((_, n, c), i) => (q, n, c, i + 1) }.toSeq
      }.toSet
    assert(exact.toSet == bruteFiltered,
      "full-probe mining must equal label-filtered brute force")
  }

  test("text analysis: sane ranges and deterministic fingerprint") {
    val a = TextAnalysis.analyze(
      Demo.table(spark, sf(), "documents"), "text", "doc_id").collect()
    assert(a.nonEmpty)
    assert(a.forall { r =>
      val q = r.getAs[Double]("quality_score"); q >= 0.0 && q <= 1.0 })
    assert(a.forall(_.getAs[String]("fingerprint").length == 32))
    // word-order-insensitive fingerprint
    val fp = TextAnalysis.analyze(
      Seq((1L, "b a c"), (2L, "a b c c")).toDF("doc_id", "text"),
      "text", "doc_id").select("fingerprint").as[String].collect()
    assert(fp(0) == fp(1))
  }

  test("pii redaction: emails, ips, phones scrubbed; clean text untouched") {
    val df = Seq(
      (1L, "write to jane.doe+x@mail.example.org or call +61 400 123 456"),
      (2L, "server at 192.168.1.17 responded; backup at 10.0.0.1"),
      (3L, "no personal information in this sentence at all"))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextAnalysis.redactPii($"text").as("red"),
      regexp_count($"text", lit(TextAnalysis.EmailRe)).as("ne"),
      regexp_count($"text", lit(TextAnalysis.Ipv4Re)).as("ni"),
      regexp_count($"text", lit(TextAnalysis.PhoneRe)).as("np"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("red") ==
      "write to <EMAIL> or call <PHONE>")
    assert(out(0).getAs[Int]("ne") == 1 && out(0).getAs[Int]("np") == 1)
    assert(out(1).getAs[String]("red") ==
      "server at <IP> responded; backup at <IP>")
    assert(out(1).getAs[Int]("ni") == 2)
    assert(out(2).getAs[String]("red") == out(2).getAs[String]("red") &&
      !out(2).getAs[String]("red").contains("<"))
  }

  test("corpus stats: exact sums and portable mean") {
    val df = Seq((1L, "a bb ccc", "en"), (2L, "dd ee", "en"),
      (3L, "ff", "de")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.corpusStats(df, "text", "lang")
      .orderBy("lang").collect()
    assert(r(0).getAs[Long]("n_docs") == 1 &&
      r(0).getAs[Long]("total_tokens") == 1)
    assert(r(1).getAs[Long]("n_docs") == 2 &&
      r(1).getAs[Long]("total_tokens") == 5 &&
      r(1).getAs[Double]("mean_doc_tokens") == 2.5)
  }

  test("language id: marker-based prediction") {
    val df = Seq(
      (1L, "the cat sat of the mat and a dog"),
      (2L, "el perro de la casa y los gatos"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val got = TextAnalysis.analyze(df, "text", "doc_id")
      .orderBy("doc_id").select("lang_pred").as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("srpBuckets kernel equals the per-plane expression chain") {
    // The flat-matrix kernel must sign every (table, plane) dot exactly
    // as the unrolled when(dot(v, lit) >= 0, 1<<p) sum it replaced —
    // the LSH oracle regenerates those per-plane dots in SQL, so any
    // drift here is a silent hash break.
    import org.apache.spark.sql.functions._
    val ops = graft.embeddings.EmbeddingOps
    val (numPlanes, numTables, dim) = (8, 12, 64)
    val viaKernel = ops.lshBuckets(emb, "embedding", "vec_id",
        numPlanes, numTables, dim)
      .select("vec_id", "table", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val v = col("embedding").cast("array<double>")
    val viaExprs = emb.select(col("vec_id"), explode(array(
        (0 until numTables).map(t => struct(lit(t).as("table"),
          ops.lshBucket(v, t, numPlanes, dim).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaKernel.size == viaExprs.size && viaKernel == viaExprs)
  }
}
