package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale rehearsal: runs the dedup family + corpus pipeline + LSH ANN
 * over the sf0.1 corpus and a synthesized 10× corpus with IDENTICAL
 * duplicate density, and reports the runtime ratio per query — the
 * empirical "would this survive a scale-up" check behind the plan-shape
 * arguments. Rerun with `sbt "runMain graft.ScaleSoak"`; output is one
 * JSON line per query plus a PASS/WARN verdict (WARN above 15× for 10×
 * data — generous for log factors and fixed overheads).
 *
 * Replica construction preserves workload density (a naive copy would
 * make every replica a near-dup of the original and explode the pair
 * output quadratically — that would measure a different workload, not
 * scaling):
 *  - documents: replica k suffixes EVERY token with "q{k}" — zero token
 *    overlap across replicas, so cross-replica shingle jaccard AND
 *    simhash both decorrelate (suffixing only some tokens left 2/3
 *    token overlap, and simhash — locality-sensitive by design — nearly
 *    collided across replicas, densifying chunk buckets into a fake
 *    quadratic workload). Within-replica dup structure is preserved
 *    bit-for-bit (equal texts stay equal, near-dups stay near-dups).
 *  - embeddings: replica k applies a deterministic per-(k, component)
 *    sign flip — an ORTHOGONAL transform, so all within-replica cosines
 *    are preserved exactly while cross-replica cosines collapse toward
 *    0 (pseudo-random half flips).
 */
object ScaleSoak {

  private val Queries = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_pairs",
    "dedup_simhash_pairs", "decontaminate_corpus", "dedup_incremental",
    "corpus_pipeline", "ann_lsh_pairs")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-soak")
    val src = sys.env.getOrElse("SOAK_SRC", "/root/testdata/sf0.1")
    val base = sys.env.getOrElse("SOAK_DIR", "/tmp/graft_soak")
    val factor = 10
    build(spark, src, s"$base/x1", 1)
    build(spark, src, s"$base/x$factor", factor)

    // Fingerprint of the EXECUTED (post-AQE) plan: the multiset of
    // join/exchange/aggregate node names. Identical fingerprints at x1
    // and x10 mean the capped-index plan SHAPE is size-invariant (AQE
    // may legitimately flip a join strategy — that shows up as a DIFF
    // and is reported, not hidden).
    def planShape(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
      df.queryExecution.executedPlan.collect {
        case p if p.nodeName.contains("Join") ||
          p.nodeName.contains("Exchange") ||
          p.nodeName.contains("Aggregate") => p.nodeName
      }.groupBy(identity).map { case (k, v) => k -> v.size }

    def timeAll(dir: String): Map[String, (Double, Map[String, Int])] =
      Queries.map { q =>
        // run twice; report the second (steady state: shared frames
        // cached, codegen warm) — mirrors the bench's warmup discipline
        var shape = Map.empty[String, Int]
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(q)(spark, dir)
          df.count()
          shape = planShape(df)
          (System.nanoTime() - t0) / 1e9
        }
        q -> (times.last, shape)
      }.toMap

    val t1 = timeAll(s"$base/x1")
    val t10 = timeAll(s"$base/x$factor")
    println("=== SOAK RESULTS (10x corpus vs 1x, steady-state seconds) ===")
    var worst = 0.0
    Queries.foreach { q =>
      val ratio = t10(q)._1 / math.max(t1(q)._1, 1e-3)
      worst = math.max(worst, ratio)
      val verdict = if (ratio <= 15.0) "PASS" else "WARN"
      val shapeNote =
        if (t1(q)._2 == t10(q)._2) "SAME"
        else {
          val d1 = (t1(q)._2.toSet -- t10(q)._2.toSet).toSeq.sorted
          val d10 = (t10(q)._2.toSet -- t1(q)._2.toSet).toSeq.sorted
          s"DIFF x1-only=$d1 x10-only=$d10"
        }
      println(f"""{"query":"$q","x1_sec":${t1(q)._1}%.3f,"x10_sec":${t10(q)._1}%.3f,"ratio":$ratio%.2f,"verdict":"$verdict","plan_shape":"$shapeNote"}""")
    }
    // The fixed-parameter ann_lsh_pairs demo keeps 2^8 buckets at any n,
    // so bucket density (and candidate pairs, quadratic in density)
    // grows with the corpus. Production scales planes with n — show the
    // tuning rule restores ~linear cost: +⌈log2 factor⌉ planes at 10×.
    def lshTimed(dir: String, planes: Int): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.embeddings.EmbeddingOps.lshCosinePairs(
          Demo.table(spark, dir, "embeddings"), "embedding", "vec_id",
          threshold = 0.45, numPlanes = planes).count()
        (System.nanoTime() - t0) / 1e9
      }.last
    val l1 = lshTimed(s"$base/x1", 8)
    val l10 = lshTimed(s"$base/x$factor", 12)
    println(f"""{"query":"ann_lsh_pairs_scaled_planes","x1_sec":$l1%.3f,"x10_sec":$l10%.3f,"ratio":${l10 / math.max(l1, 1e-3)}%.2f,"note":"planes 8 at x1 vs 12 at x10 - buckets scale with n"}""")
    // Same story for simhash: this corpus's low token entropy clusters
    // fingerprints into hot chunk values, so exact-recall banding pays
    // sum(ca*cb) candidates. The chunk-frequency cap bounds the fan-out
    // (recall caveat documented on the operator).
    def shTimed(dir: String, cap: Option[Long]): (Double, Long) = {
      var rows = 0L
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.dedup.TextDedup.simhashPairs(
          Demo.table(spark, dir, "documents"), "text", "doc_id",
          maxChunkFreq = cap).count()
        (System.nanoTime() - t0) / 1e9
      }.last
      (t, rows)
    }
    val (s1, r1) = shTimed(s"$base/x1", Some(200L))
    val (s10, r10) = shTimed(s"$base/x$factor", Some(200L))
    val (_, rExact) = shTimed(s"$base/x$factor", None)
    println(f"""{"query":"dedup_simhash_pairs_capped","x1_sec":$s1%.3f,"x10_sec":$s10%.3f,"ratio":${s10 / math.max(s1, 1e-3)}%.2f,"x10_pairs_capped":$r10,"x10_pairs_exact":$rExact,"x1_pairs_capped":$r1,"note":"maxChunkFreq=200 bounds hot-chunk fan-out"}""")
    // The structural exact-recall fix: Manku-style wide bucket keys.
    def wideTimed(dir: String): (Double, Long) = {
      var rows = 0L
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.dedup.TextDedup.simhashPairsWide(
          Demo.table(spark, dir, "documents"), "text", "doc_id").count()
        (System.nanoTime() - t0) / 1e9
      }.last
      (t, rows)
    }
    val (w1, _) = wideTimed(s"$base/x1")
    val (w10, wr10) = wideTimed(s"$base/x$factor")
    println(f"""{"query":"dedup_simhash_pairs_wide","x1_sec":$w1%.3f,"x10_sec":$w10%.3f,"ratio":${w10 / math.max(w1, 1e-3)}%.2f,"x10_pairs":$wr10,"note":"45-bit 3-chunk keys - exact recall, corpus-scale selectivity"}""")
    println(f"""{"metric":"soak_worst_ratio","value":$worst%.2f,"factor":$factor}""")
    spark.stop()
  }

  /** Write documents.parquet + embeddings.parquet with `k` density-
    * preserving replicas of the source corpus into `dir`. */
  def build(spark: SparkSession, src: String, dir: String, k: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    replicateDocs(docs, k).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    replicateEmbeddings(embs, k).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }

  /** Replica id stride: derived from max(id)+1, NOT a fixed constant —
    * a fixed 1e6 stride silently collides replicas with originals the
    * moment the source corpus has ids ≥ 1e6, and the soak would then
    * measure a corrupted workload. */
  private def idStride(df: DataFrame, idCol: String): Long =
    df.agg(max(col(idCol))).head().getLong(0) + 1L

  private[graft] def replicateDocs(docs: DataFrame, k: Int): DataFrame = {
    val stride = idStride(docs, "doc_id")
    (0 until k).map { rep =>
      if (rep == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(rep * stride))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"q$rep"))),
          " "))
    }.reduce(_ unionByName _)
  }

  private[graft] def replicateEmbeddings(embs: DataFrame, k: Int): DataFrame = {
    val stride = idStride(embs, "vec_id")
    (0 until k).map { rep =>
      if (rep == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(rep * stride))
        .withColumn("embedding",
          zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            // deterministic ±1 per (rep, component): md5 parity — the
            // same portable hash construction the sampler uses
            (x, i) => x * (lit(1.0) - lit(2.0) *
              (conv(substring(md5(concat(lit(s"$rep:"), i)), 1, 15), 16, 10)
                .cast("long") % 2).cast("double")).cast("float")))
    }.reduce(_ unionByName _)
  }
}
