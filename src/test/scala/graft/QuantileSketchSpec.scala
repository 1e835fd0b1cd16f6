package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The deterministic bottom-k quantile sketch: partition invariance,
  * merge ≡ batch, the nearest-rank estimate rule, null handling, and
  * the ~1/√k rank-error envelope on real data. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def scored = spark.read
    .parquet(s"${sf()}/documents.parquet")
    .select(col("lang"), col("doc_id").cast("string").as("key"),
      (col("n_chars").cast("double") /
        ((col("doc_id") % 7) + 1).cast("double")).as("score"))

  private def sketchOf(df: org.apache.spark.sql.DataFrame,
      k: Int): Map[String, Seq[Double]] =
    df.groupBy("lang")
      .agg(GraftFunctions.quantile_sketch(col("score"), col("key"), k)
        .as("sm"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap

  test("partition-invariant: 1, 5, and 32 partitions produce identical sketches") {
    val base = sketchOf(scored.coalesce(1), 64)
    assert(base.values.forall(_.nonEmpty))
    assert(sketchOf(scored.repartition(5, col("key")), 64) == base)
    assert(sketchOf(scored.repartition(32), 64) == base)
    // and a shuffled row order
    assert(sketchOf(scored.orderBy(col("score").desc), 64) == base)
  }

  test("merged epoch partials ≡ the batch sketch (bottom-k union property)") {
    val batch = scored
      .agg(GraftFunctions.quantile_sketch(col("score"), col("key"), 48)
        .as("sm"))
      .collect()(0).getSeq[Double](0).toSeq
    val partials = (0 until 3).map { b =>
      scored.filter(col("key").cast("long") % 3 === b)
        .agg(GraftFunctions
          .quantile_sketch_partial(col("score"), col("key"), 48).as("p"))
    }.reduce(_ union _)
    val merged = partials
      .agg(GraftFunctions.quantile_merge(collect_list(col("p")), 48)
        .as("sm"))
      .collect()(0).getSeq[Double](0).toSeq
    assert(merged == batch)
  }

  test("estimate is the lower nearest-rank pick, null on empty") {
    val df = Seq((Seq(10.0, 30.0, 20.0, 40.0), 1)).toDF("sm", "x")
    val got = df.select(
      GraftFunctions.quantile_estimate(col("sm"), 0.0).as("q0"),
      GraftFunctions.quantile_estimate(col("sm"), 0.5).as("q50"),
      GraftFunctions.quantile_estimate(col("sm"), 0.75).as("q75"),
      GraftFunctions.quantile_estimate(col("sm"), 1.0).as("q100"))
      .collect()(0)
    // sorted sample [10,20,30,40]: floor(q·3) → 0,1,2,3
    assert(got.getDouble(0) == 10.0 && got.getDouble(1) == 20.0)
    assert(got.getDouble(2) == 30.0 && got.getDouble(3) == 40.0)
    val empty = Seq((Seq.empty[Double], 1)).toDF("sm", "x")
      .select(GraftFunctions.quantile_estimate(col("sm"), 0.5)).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("null values and null keys are skipped; sample smaller than k is exact") {
    val df = Seq(
      (Some(1.0), Some("a")), (None, Some("b")), (Some(3.0), None),
      (Some(2.0), Some("d")))
      .toDF("v", "k")
    val sm = df.agg(GraftFunctions
      .quantile_sketch(col("v"), col("k"), 16).as("sm"))
      .collect()(0).getSeq[Double](0)
    assert(sm.sorted == Seq(1.0, 2.0))
    // k ≥ n → the sketch IS the data: estimates are exact
    val est = df.agg(GraftFunctions
      .quantile_sketch(col("v"), col("k"), 16).as("sm"))
      .select(GraftFunctions.quantile_estimate(col("sm"), 1.0))
      .collect()(0).getDouble(0)
    assert(est == 2.0)
  }

  test("rank error on real data stays inside the sampling envelope") {
    val n = scored.count()
    val sk = scored.agg(GraftFunctions
      .quantile_sketch(col("score"), col("key"), 256).as("sm"))
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val est = sk.select(GraftFunctions.quantile_estimate(col("sm"), q))
        .collect()(0).getDouble(0)
      val le = scored.filter(col("score") <= est).count()
      val rankErr = math.abs(le.toDouble / n - q)
      val envelope = 4.0 * math.sqrt(q * (1 - q) / 256.0) + 1.0 / n
      assert(rankErr <= envelope, s"q=$q err=$rankErr > $envelope")
    }
  }

  test("topFractionBySketch: kept fraction inside the ~1/√k envelope, deterministic, tie-inclusive") {
    val n = scored.count().toDouble
    val kept = graft.operators.Sampling.topFractionBySketch(
      scored, "score", "key", permille = 100, k = 256)
    val frac = kept.count() / n
    assert(math.abs(frac - 0.1) <= 4.0 * math.sqrt(0.1 * 0.9 / 256.0) + 1.0 / n,
      s"kept $frac")
    // deterministic under repartitioning
    val keptIds = kept.select("key").collect().map(_.getString(0)).sorted.toSeq
    val again = graft.operators.Sampling.topFractionBySketch(
      scored.repartition(17), "score", "key", permille = 100, k = 256)
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(again == keptIds)
    // every kept score ≥ every dropped score (a clean threshold cut)
    val minKept = kept.agg(min(col("score"))).collect()(0).getDouble(0)
    val maxDropped = scored.join(kept.select("key"), Seq("key"), "left_anti")
      .agg(max(col("score"))).collect()(0).getDouble(0)
    assert(maxDropped < minKept)
  }

  test("topFractionBySketchBy: each stratum cut at its own threshold") {
    val kept = graft.operators.Sampling.topFractionBySketchBy(
      scored, "score", "key", "lang", permille = 200, k = 64)
    val perLang = scored.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every language keeps ~20% of ITS OWN rows (not of the corpus)
    perLang.foreach { case (lang, n) =>
      val f = keptPerLang.getOrElse(lang, 0L).toDouble / n
      val env = 4.0 * math.sqrt(0.2 * 0.8 / 64.0) + 1.0 / n
      assert(math.abs(f - 0.2) <= env, s"$lang kept $f of $n")
    }
    // within each language: kept scores dominate dropped scores
    val minKept = kept.groupBy("lang").agg(min(col("score")).as("mk"))
    val maxDropped = scored.join(kept.select("key"), Seq("key"), "left_anti")
      .groupBy("lang").agg(max(col("score")).as("md"))
    minKept.join(maxDropped, "lang").collect().foreach { r =>
      assert(r.getDouble(2) < r.getDouble(1), r.getString(0))
    }
  }

  test("deletion contract is rebuild-only: filtering tombstones out of truncated partials biases; re-sketching survivors is exact") {
    // An epoch partial is a TRUNCATED bottom-k: rows outside the k
    // smallest were discarded at commit time, so no compensation epoch
    // can re-surface the survivors a deleted row crowded out
    // (StreamingQuantile's documented contract).
    val k = 16
    // value ↔ key is a bijection (v = i, key = "k<i>"), so a partial
    // entry identifies its row exactly
    val rows = (0 until 100).map(i => (s"k$i", i.toDouble))
      .toDF("key", "score")
    val epochA = rows.filter(col("score") < 50)
    val epochB = rows.filter(col("score") >= 50)
    def partialRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.agg(GraftFunctions
        .quantile_sketch_partial(col("score"), col("key"), k).as("p"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getDouble(1)))
    val pA = partialRows(epochA)
    assert(pA.size == k) // truncation actually bit (50 rows → 16 kept)
    // delete exactly the rows epoch A retained: their (h, v) entries
    // vanish from the partial, but the rows they crowded out were
    // already discarded at commit time
    val deletedHashes = pA.map(_._1).toSet
    val deletedKeys = pA.map(e => s"k${e._2.toInt}").toSet
    val filteredMerged = (pA.filterNot(e => deletedHashes(e._1)) ++
      partialRows(epochB)).sorted.take(k).map(_._2)
    // ground truth: a fresh sketch over the SURVIVING corpus
    val survA = epochA.filter(!col("key").isin(deletedKeys.toSeq: _*))
    val batchSurv = partialRows(survA.unionByName(epochB)).map(_._2)
    // naive tombstone filtering loses epoch A's survivors entirely —
    // the merged sample under-represents them and the estimate biases
    assert(filteredMerged != batchSurv,
      "tombstone filtering of truncated partials must NOT equal a survivor rebuild")
    // the supported path — drop the partials, re-sketch survivors —
    // merges to the survivor batch sketch exactly (bottom-k union)
    val rebuiltMerged = (partialRows(survA) ++ partialRows(epochB))
      .sorted.take(k).map(_._2)
    assert(rebuiltMerged == batchSurv)
  }

  test("k bounds are enforced") {
    val e = intercept[Exception] {
      scored.agg(GraftFunctions
        .quantile_sketch(col("score"), col("key"), 8)).collect()
    }
    assert(e.getMessage.contains("[16, 65536]"))
  }
}
