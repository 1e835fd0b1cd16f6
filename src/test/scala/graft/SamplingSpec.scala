package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = Demo.table(spark, sf(), "documents")
    .select("doc_id", "text")

  test("sample membership is stable across repartitioning") {
    val a = Sampling.sampled(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampled(docs.repartition(13), "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("sampled fraction lands near the requested rate") {
    val n = docs.count().toDouble
    val k = Sampling.sampled(docs, "doc_id", 0.5).count().toDouble
    assert(math.abs(k / n - 0.5) < 0.1, s"got ${k / n}")
  }

  test("byWeight: kept rate tracks per-row weights; 1.0 always keeps, 0.0 never; hash-stable") {
    import spark.implicits._
    val df = (0L until 4000L).map { i =>
      (i, if (i % 4 == 0) 1.0 else if (i % 4 == 1) 0.0
          else if (i % 4 == 2) 0.5 else 0.25)
    }.toDF("doc_id", "weight")
    val kept = Sampling.byWeight(df, "doc_id", "weight")
    val byW = kept.groupBy("weight").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byW(1.0) == 1000L)                 // weight 1 → all kept
    assert(!byW.contains(0.0))                // weight 0 → none kept
    assert(math.abs(byW(0.5) / 1000.0 - 0.5) < 0.1)
    assert(math.abs(byW(0.25) / 1000.0 - 0.25) < 0.1)
    // membership is a pure key hash — stable under repartitioning
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.byWeight(df.repartition(13), "doc_id", "weight")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // composed with soft-dedup weights: expected mass ≈ distinct count
    val corpus = docs.unionByName(docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val w = graft.dedup.TextDedup.softDedupWeights(corpus, "text", "doc_id")
    val survivors = Sampling.byWeight(w, "doc_id", "weight").count().toDouble
    val distinct = corpus.select("text").distinct().count().toDouble
    assert(math.abs(survivors / distinct - 1.0) < 0.15,
      s"$survivors vs $distinct")
  }

  test("byWeight: sub-10⁻⁴ weights survive at the grain floor instead of deterministic extinction") {
    import spark.implicits._
    // weight 1/20000 floors to threshold 0 without the clamp — a
    // duplicate group with n_copies > 10⁴ (routine boilerplate at
    // corpus scale) would be deterministically erased, contradicting
    // the never-discard contract (round-14 advice). With the clamp the
    // group keeps at the 10⁻⁴ floor rate.
    val n = 100000L
    val tiny = (0L until n).map(i => (i, 1.0 / 20000)).toDF("doc_id", "weight")
    val kept = Sampling.byWeight(tiny, "doc_id", "weight").count()
    assert(kept > 0, "sub-grain weights must never be extinguished")
    assert(kept < n / 2000, s"clamp keeps ~1e-4, got $kept of $n")
    // zero and negative weights still never keep
    val dead = (0L until 1000L).map(i => (i, if (i % 2 == 0) 0.0 else -0.5))
      .toDF("doc_id", "weight")
    assert(Sampling.byWeight(dead, "doc_id", "weight").count() == 0)
  }

  // ids whose md5 bucket is 0 — the rows a ≥1-grain threshold is
  // guaranteed to keep; planted into sub-grain classes below so
  // survival is asserted deterministically, not probabilistically.
  private def bucketZeroIds(n: Int): Seq[Long] =
    spark.range(1000000)
      .filter(Sampling.bucket(col("id")) === 0L)
      .limit(n).collect().map(Long2long).toSeq

  test("byMixture: a sub-grain derived rate thins the class instead of erasing it") {
    import spark.implicits._
    // minor class: share 1e-9 over 20000 rows → rate ≈ 5e-10, floors to
    // threshold 0 — without the derived-rate clamp the ENTIRE class the
    // caller asked to keep would vanish from the mix.
    val planted = bucketZeroIds(5)
    assert(planted.size == 5)
    val minor = (planted ++ (0 until 20000 - planted.size)
      .map(i => 2000000L + i)).map((_, "minor"))
    val major = (0 until 20000).map(i => (3000000L + i, "major"))
    val d = (minor ++ major).toDF("id", "cls")
    val out = Sampling.byMixture(d, "id", "cls",
      Map("minor" -> 1e-9, "major" -> 1.0), outFraction = 0.5)
    val keptMinor = out.filter($"cls" === "minor")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(planted.forall(keptMinor), s"planted bucket-0 rows must survive")
    // the clamp keeps at the 1e-4 floor rate — thinned, not erased
    assert(keptMinor.size < 20000 / 1000, s"kept ${keptMinor.size}")
    // every survivor cleared the 1-grain threshold: bucket 0 exactly
    assert(d.filter($"id".isin(keptMinor.toSeq: _*))
      .filter(Sampling.bucket($"id") =!= 0L).count() == 0)
  }

  test("byTemperature: a sub-grain flattened rate thins the head class instead of erasing it") {
    import spark.implicits._
    // 20000 singleton classes inflate the √-weight normalizer so the
    // head class (2/3 of the corpus) flattens to rate ≈ 7e-5 — without
    // the clamp the dominant class would be deterministically erased.
    val planted = bucketZeroIds(5)
    val head = (planted ++ (0 until 40000 - planted.size)
      .map(i => 2000000L + i)).map((_, "head"))
    val tails = (0 until 20000).map(i => (3000000L + i, s"t$i"))
    val d = (head ++ tails).toDF("id", "cls")
    val out = Sampling.byTemperature(d, "id", "cls",
      outFraction = 0.005, tau = 0.5)
    val keptHead = out.filter($"cls" === "head")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(planted.forall(keptHead), "planted bucket-0 rows must survive")
    assert(keptHead.size < 40000 / 1000, s"kept ${keptHead.size}")
    assert(d.filter($"id".isin(keptHead.toSeq: _*))
      .filter(Sampling.bucket($"id") =!= 0L).count() == 0)
  }

  test("split partitions the keys disjointly and exhaustively") {
    val out = Sampling.split(docs, "doc_id", 0.7, 0.2, 0.1)
    assert(out.count() == docs.count())
    val labels = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
    // each doc appears exactly once with exactly one label
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("byMixture: output mix approaches targets; untargeted classes drop") {
    val d = Demo.table(spark, sf("sf0.01"), "documents")
      .select("doc_id", "lang")
    val out = Sampling.byMixture(d, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5), outFraction = 0.3)
    val mix = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix.keySet == Set("en", "de")) // es/fr/zh have no target share
    val n = mix.values.sum.toDouble
    // hash-grain + rounding tolerance: each share within 15pp of target
    assert(math.abs(mix("en") / n - 0.5) < 0.15, s"mix=$mix")
    assert(math.abs(mix("de") / n - 0.5) < 0.15, s"mix=$mix")
    // overall volume near outFraction of the corpus
    assert(math.abs(n / d.count() - 0.3) < 0.1)
    // determinism across partitionings
    val again = Sampling.byMixture(d.repartition(9), "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5), outFraction = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("byMixture: infeasible target caps at keeping the whole class") {
    val s = spark
    import s.implicits._
    // class "b" has 2 rows but the target asks for far more than exists
    val d = ((1L to 98L).map(i => (i, "a")) ++ Seq((99L, "b"), (100L, "b")))
      .toDF("id", "cls")
    val out = Sampling.byMixture(d, "id", "cls",
      Map("a" -> 0.2, "b" -> 0.8), outFraction = 0.5)
    val mix = out.groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix("b") == 2) // rate capped at 1.0: both rows kept
  }

  test("stratified: per-stratum rates honored, default applies elsewhere") {
    val cust = Demo.table(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment")
    val out = Sampling.stratified(cust, "c_custkey", "c_mktsegment",
      Map("BUILDING" -> 0.5), defaultFraction = 0.05)
    val byStratum = out.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = cust.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bRate = byStratum("BUILDING").toDouble / totals("BUILDING")
    assert(math.abs(bRate - 0.5) < 0.15, s"BUILDING rate $bRate")
    totals.keys.filter(_ != "BUILDING").foreach { s =>
      val r = byStratum.getOrElse(s, 0L).toDouble / totals(s)
      assert(r < 0.2, s"stratum $s rate $r")
    }
  }

  test("balanced: every stratum downsampled to the smallest stratum's size") {
    import spark.implicits._
    // strata of sizes 50, 20, 7
    val rows = ((1L to 50L).map((_, "a")) ++ (101L to 120L).map((_, "b")) ++
      (201L to 207L).map((_, "c"))).toDF("k", "s")
    val out = Sampling.balanced(rows, "k", "s").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySize = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySize === Map("a" -> 7, "b" -> 7, "c" -> 7))
    // deterministic across repartitioning — same SET of survivors
    val out2 = Sampling.balanced(rows.repartition(13), "k", "s").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === out2.toSet)
    // explicit per-stratum cap: strata smaller than the cap keep all rows
    val capped = Sampling.balanced(rows, "k", "s", perStratum = Some(10L))
      .collect().map(r => r.getString(1))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(capped === Map("a" -> 10, "b" -> 10, "c" -> 7))
  }

  test("repeatByFactor: integer factors copy exactly; fractions hit E[f]; f<1 thins") {
    import spark.implicits._
    val rows = ((1L to 200L).map((_, "en")) ++ (1001L to 1200L).map((_, "de")) ++
      (2001L to 2200L).map((_, "fr"))).toDF("k", "c")
    val out = Sampling.repeatByFactor(rows, "k", "c",
      Map("en" -> 2.5, "de" -> 2.0, "fr" -> 0.25)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byClass = out.groupBy(_._2).view.mapValues(_.length).toMap
    // de ×2.0: exactly 400; en ×2.5 ∈ [400, 600]; fr ×0.25 ∈ (0, 200)
    assert(byClass("de") === 400)
    assert(byClass("en") >= 2 * 200 && byClass("en") <= 3 * 200)
    assert(math.abs(byClass("en") - 500) < 60, s"en=${byClass("en")}")
    assert(byClass("fr") > 0 && byClass("fr") < 200)
    assert(math.abs(byClass("fr") - 50) < 30, s"fr=${byClass("fr")}")
    // copy indexes are dense 0..reps-1 per key
    val reps = out.groupBy(t => (t._1, t._2)).values
    assert(reps.forall(c => c.map(_._3).sorted.toSeq == (0L until c.length)))
    // deterministic across repartitioning
    val out2 = Sampling.repeatByFactor(rows.repartition(17), "k", "c",
      Map("en" -> 2.5, "de" -> 2.0, "fr" -> 0.25)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === out2.toSet)
    // the fractional-extra keys are exactly the 0.5-hash-thinned set
    val extras = out.filter(t => t._2 == "en" && t._3 == 2L).map(_._1).toSet
    val thinned = Sampling.sampled(rows.filter($"c" === "en"), "k", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(extras === thinned)
  }

  test("byTemperature: τ=0.5 flattens the class mix; τ=1 thins uniformly") {
    import spark.implicits._
    // heavily skewed classes: 900 / 90 / 10
    val rows = ((1L to 900L).map((_, "big")) ++ (10001L to 10090L).map((_, "mid")) ++
      (20001L to 20010L).map((_, "tiny"))).toDF("k", "c")
    val out = Sampling.byTemperature(rows, "k", "c", outFraction = 0.3)
    val kept = out.groupBy("c").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = kept.values.sum.toDouble
    // raw shares 0.9/0.09/0.01 → √-weights 30/9/3 → target 0.714/0.214/0.071:
    // the tail classes gain share, the head loses it
    assert(kept("big") / tot < 0.85, s"kept=$kept")
    assert(kept("mid") / tot > 0.12, s"kept=$kept")
    assert(kept("tiny").toDouble / 10 > kept("big").toDouble / 900,
      s"tiny keep-rate should exceed big keep-rate: $kept")
    // overall volume near outFraction
    assert(math.abs(tot / 1000 - 0.3) < 0.1, s"total=$tot")
    // τ=1 degenerates to uniform thinning: same rate for every class
    val flat = Sampling.byTemperature(rows, "k", "c", 0.3, tau = 1.0)
    val flatKept = flat.groupBy("c").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(flatKept("big").toDouble / 900 - 0.3) < 0.08)
    assert(flatKept === Sampling.sampled(rows, "k", 0.3).groupBy("c").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // determinism across partitionings — same survivor set
    val again = Sampling.byTemperature(rows.repartition(11), "k", "c", 0.3)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again === out.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("byTemperature: a tiny class whose target exceeds its size caps at 1.0") {
    import spark.implicits._
    val rows = ((1L to 998L).map((_, "a")) ++ Seq((9001L, "b"), (9002L, "b")))
      .toDF("k", "c")
    // √-weights 31/1 → b's target share 1/32 of 0.5·1000 = 15.6 rows but
    // only 2 exist: rate caps at 1.0, both kept
    val out = Sampling.byTemperature(rows, "k", "c", outFraction = 0.5)
    val kept = out.groupBy("c").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("b") == 2, s"kept=$kept")
  }

  test("topFractionByScore: exact tie-inclusive cut, no corpus sort needed") {
    import spark.implicits._
    // scores at 4-dp grain with a fat tie class straddling the cut
    val rows = ((1L to 50L).map((_, 0.9)) ++ (51L to 100L).map((_, 0.5)) ++
      (101L to 200L).map((_, 0.1))).toDF("id", "s")
    // top 30% of 200 = 60 → threshold falls INSIDE the 0.5 tie class:
    // all 50 of 0.9 plus the whole 0.5 class (tie-inclusive) = 100
    val out = Sampling.topFractionByScore(rows, "s", permille = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 100)
    assert(out.forall(_._2 >= 0.5))
    // a cut landing exactly on a class boundary keeps exactly that class
    val exact = Sampling.topFractionByScore(rows, "s", permille = 250)
      .collect().map(_.getLong(0)).toSet
    assert(exact == (1L to 50L).toSet)
    // determinism under repartitioning
    val again = Sampling.topFractionByScore(rows.repartition(9), "s", 300)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.map(_._1).toSet)
    // negative scores round and cut correctly too
    val neg = ((1L to 10L).map((_, -0.2)) ++ (11L to 20L).map((_, -0.8)))
      .toDF("id", "s")
    val topNeg = Sampling.topFractionByScore(neg, "s", 500)
      .collect().map(_.getLong(0)).toSet
    assert(topNeg == (1L to 10L).toSet)
  }

  test("balanced: hash-threshold prefilter preserves the selection") {
    import spark.implicits._
    val rows = ((1L to 400L).map((_, "a")) ++ (1001L to 1100L).map((_, "b")))
      .toDF("k", "s")
    val full = Sampling.balanced(rows, "k", "s", perStratum = Some(20L))
      .collect().map(r => r.getLong(0)).toSet
    // pre-thin to ~50% by hash: rank order under the SAME hash is
    // preserved, so as long as ≥20 rows/stratum survive the prefilter
    // the balanced selection is identical
    val thinned = Sampling.balanced(Sampling.sampled(rows, "k", 0.5),
      "k", "s", perStratum = Some(20L))
      .collect().map(r => r.getLong(0)).toSet
    assert(thinned === full)
  }
}
