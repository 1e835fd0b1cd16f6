package graft.dedup

import graft.embeddings.SemanticDedup
import graft.operators.Materialized
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SEMANTIC-decontamination evaluation mart — the threshold-selection
 * surface for [[SemanticDedup.semanticContaminationPairs]], mirroring
 * [[DedupEval]]'s planted-ground-truth discipline: before trusting a
 * cosine threshold to guard a 100 TB train set against eval leakage,
 * measure how much semantic drift the detector survives at each
 * candidate threshold.
 *
 * Ground truth is PLANTED, deterministically: every bench vector b
 * (the `vec_id % 10 = 3` demo eval split) is mixed with a fixed
 * CARRIER train vector c (the one at `vec_id = bench_id − 3`, always a
 * train id in the demo split) at four mix levels —
 *
 *   copy    λ=0.0   the verbatim leak (cosine 1.0 — the sanity anchor)
 *   light   λ=0.1   lightly reworded (near-copy drift)
 *   medium  λ=0.3   substantially drifted
 *   heavy   λ=0.5   half-carrier (at/beyond plausible paraphrase)
 *
 * leak = (1−λ)·b + λ·c, planted at `vec_id = 10⁶ + bench_id·10 + λᵢ`
 * (collision-free with real ids). Cosine to b falls with λ at a rate
 * set by the corpus's own geometry — the mart reports the measured
 * recall per (level, threshold), which is exactly the operating
 * question ("would a τ=0.95 gate still catch a medium rewrite?").
 *
 * The detector run is the production operator itself, ONCE at the
 * loosest threshold in the grid; tighter thresholds are evaluated by
 * re-bucketing the same pair set on its exact cosine (a pair is
 * reported at τ iff cosine ≥ τ, so this is equivalent to re-running —
 * one pass, |grid| verdicts). `n_wrong_bench` counts a level's leaks
 * detected against a DIFFERENT bench item (the precision face of the
 * planted truth); natural train↔bench similarity is out of the planted
 * scope and stays visible in `decontaminate_semantic_pairs` itself.
 */
object DecontaminationEval {

  /** (level, λ, index) mix grid, loosest drift last. */
  val Levels: Seq[(String, Double, Int)] = Seq(
    ("copy", 0.0, 0), ("light", 0.1, 1), ("medium", 0.3, 2),
    ("heavy", 0.5, 3))

  /** Candidate thresholds, evaluated from one detector pass at min. */
  val Thresholds: Seq[Double] = Seq(0.95, 0.8, 0.6)

  private val LeakBase = 1000000L

  /** The planted leak rows: (vec_id, truth_bench, level, lam, v). */
  def plantedLeaks(emb: DataFrame, vecCol: String,
      idCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val bench = e.filter(col("vec_id") % 10 === 3)
      .select(col("vec_id").as("bench_id"), col("v").as("bv"))
    val carrier = e.select((col("vec_id") + 3).as("bench_id"),
      col("v").as("cv"))
    val lv = Levels.toDF("level", "lam", "li")
    bench.join(carrier, "bench_id")
      .crossJoin(broadcast(lv))
      .select(
        (lit(LeakBase) + col("bench_id") * 10 + col("li")).as("vec_id"),
        col("bench_id").as("truth_bench"), col("level"), col("lam"),
        zip_with(col("bv"), col("cv"),
          (x, y) => (lit(1.0) - col("lam")) * x + col("lam") * y).as("v"))
  }

  /** The mart: (level, lam, threshold, n_truth, n_detected, recall,
    * n_wrong_bench), one row per (mix level, candidate threshold). */
  def evalReport(emb: DataFrame, vecCol: String, idCol: String,
      cents: Array[(Long, Array[Double], Double)],
      nprobe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val leaks = Materialized(plantedLeaks(emb, vecCol, idCol))
    val trainEval = e.filter(col("vec_id") % 10 =!= 3)
      .unionByName(leaks.select("vec_id", "v"))
    val bench = e.filter(col("vec_id") % 10 === 3)
    val det = SemanticDedup.semanticContaminationPairs(trainEval, bench,
      "v", "vec_id", cents, Thresholds.min, nprobe)
    val truth = leaks.select(col("vec_id"), col("truth_bench"),
      col("level"), col("lam"))
    // every detected pair whose train side is a planted leak, tagged
    // with its level and whether it hit its own bench
    val tagged = det.join(truth, Seq("vec_id"))
      .select(col("level"), col("lam"),
        (col("bench_id") === col("truth_bench")).as("hit"),
        col("cosine"))
    val thr = Thresholds.toDF("threshold")
    val truthCounts = leaks.groupBy("level", "lam")
      .agg(count(lit(1)).as("n_truth"))
    truthCounts.crossJoin(broadcast(thr))
      .join(tagged.crossJoin(broadcast(thr))
        .filter(col("cosine") >= col("threshold"))
        .groupBy("level", "lam", "threshold")
        .agg(count(when(col("hit"), 1)).as("n_detected_0"),
          count(when(!col("hit"), 1)).as("n_wrong_0")),
        Seq("level", "lam", "threshold"), "left")
      .select(col("level"), col("lam"), col("threshold"), col("n_truth"),
        coalesce(col("n_detected_0"), lit(0L)).as("n_detected"),
        round(coalesce(col("n_detected_0"), lit(0L)).cast("double") /
          col("n_truth"), 4).as("recall"),
        coalesce(col("n_wrong_0"), lit(0L)).as("n_wrong_bench"))
  }
}
