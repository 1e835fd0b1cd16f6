package graft.embeddings

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Principal-component analysis over an embedding column — the TRAINED
 * (data-derived) counterpart of the Johnson–Lindenstrauss random
 * projection ([[EmbeddingOps.randomProjection]]), and the standard
 * dimensionality-reduction / whitening step a large-scale curation
 * pipeline runs before clustering, SemDeDup, or quantized ANN (OPQ's
 * rotation, SemDeDup's reduced-dim clustering).
 *
 * Algorithm: top-`k` eigenvectors of the corpus scatter matrix by
 * FIXED-ITERATION orthogonal iteration — the power method with a
 * per-iteration Gram–Schmidt sweep against the already-found
 * components (plain power-with-deflation stalls on near-flat spectra;
 * the sweep keeps the basis orthonormal BY CONSTRUCTION and converges
 * per spectral gap) — the deterministic sibling of the engine's other
 * fixed-iteration trainers (Lloyd k-means, logistic-regression
 * descent).
 *
 * Determinism discipline (two tiers, both engine-exact):
 *
 *  1. CORPUS-SIZED sums are exact integers. Embedding values are
 *     quantized to micro units (floor(x·1e6 + 0.5), the
 *     [[graft.text.Classifier]] centroid discipline), the mean is the
 *     micro-rounded integer mean, and the scatter matrix
 *     S[i][j] = Σ_d (x_i−μ_i)(x_j−μ_j) is a sum of LONG products
 *     accumulated in DECIMAL(38,0) — exact and order-independent, so
 *     the statistic is identical under any partitioning.
 *  2. The BOUNDED (d²-entry) eigen-iteration runs on the driver in
 *     double precision with PINNED fold orders (ascending-index
 *     left-to-right sums, strict-inequality first-wins argmax, the
 *     `max(·, 1e-12)` norm guard) — every operation is an IEEE-defined
 *     function of exact inputs, so a DuckDB replay with the same fold
 *     orders ([[PcaOracles]]) reproduces it bit for bit, exactly as
 *     the Lloyd/codebook oracles replay the k-means trainers. No
 *     rounding functions are involved anywhere: outputs are either
 *     integers (micro weights) or raw IEEE doubles.
 *
 * Sign canonicalization: each component is flipped so its
 * largest-|entry| coordinate (strict >, first wins) is positive —
 * eigenvectors are defined up to sign, and this pins one.
 *
 * Scale shape: two corpus passes — the mean/guard aggregation
 * (d-row result) and the outer-product aggregation (d² keys, map-side
 * partial aggregation, O(d²) work per row — d=64 → 4096 LONG
 * multiplies, all inside one codegen'd generator + hash agg). The
 * eigen-solve touches only the d²-entry matrix (driver-bounded);
 * projection is MAP-SIDE ONLY (mean and component arrays ride the plan
 * as literals, one exact integer dot per component per row, no
 * shuffle, no join). The model is O(k·d) rows — broadcastable at any
 * corpus size.
 */
object Pca {

  /** Micro-unit bound: |micro(x)| must stay below this so centered
    * LONG products cannot overflow under ANSI mode (2e9² < 2⁶³). */
  private val MaxAbsMicro = 1000000000L

  /**
   * A fitted PCA model.
   *
   * @param dim    embedding dimensionality
   * @param n      corpus rows the statistics were computed over
   * @param meanU  per-dimension micro-rounded integer mean (length dim)
   * @param comps  sign-canonical unit-norm components, row-major
   *               (k × dim raw doubles)
   * @param lambdas eigenvalue estimates (scatter/n, micro²-scaled back
   *               to value units), one per component, non-increasing
   * @param trace  trace of the covariance estimate (total variance)
   */
  final case class Model(dim: Int, n: Long, meanU: Array[Long],
      comps: Array[Array[Double]], lambdas: Array[Double], trace: Double) {
    /** Component weights as micro-unit integers — exactly the values
      * projection applies (and what [[writeModel]] persists). */
    def compU: Array[Array[Long]] =
      comps.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))
  }

  private def microArr(vecCol: String) =
    transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(1e6) + lit(0.5)).cast("long"))

  /** Rows with a non-null, dimension-`d` embedding, as micro arrays. */
  private def microFrame(df: DataFrame, vecCol: String, idCol: String,
      d: Int): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === d)
      .select(col(idCol).as("vec_id"), microArr(vecCol).as("mu"))

  /** Probe the embedding dimensionality: the MAXIMUM width over the
    * table (one bounded aggregate) — deterministic under any scan
    * order, unlike a first-row probe, so a mixed-width table always
    * fits the same (widest) population. */
  private def probeDim(df: DataFrame, vecCol: String): Int = {
    val head = df.filter(col(vecCol).isNotNull)
      .agg(max(size(col(vecCol))).as("d")).head(1)
    require(head.nonEmpty && !head(0).isNullAt(0),
      "no non-null embeddings to fit PCA on")
    head(0).getInt(0)
  }

  /**
   * Fit the top-`k` components with `iters` power iterations each.
   * Both corpus aggregations are exact-integer; the driver eigen-loop
   * below pins every fold order the oracle replays.
   */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int = 4,
      iters: Int = 32): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val d = probeDim(df, vecCol)
    require(k <= d, s"k=$k exceeds embedding dimension $d")
    val vecs = graft.operators.Materialized(microFrame(df, vecCol, idCol, d))
    val n = vecs.count()
    require(n > 0, "no rows to fit PCA on")
    // pass 1: per-dimension exact micro sum (mean) + range guard
    val meanRows = vecs
      .select(posexplode(col("mu")).as(Seq("dim", "m")))
      .groupBy("dim")
      .agg(sum(col("m").cast("decimal(38,0)")).as("s"),
        max(abs(col("m"))).as("mx"))
      .select(col("dim"),
        floor(col("s").cast("double") / lit(n.toDouble) + lit(0.5))
          .cast("long").as("mb"),
        col("mx"))
      .collect()
    val maxAbs = meanRows.map(_.getLong(2)).max
    require(maxAbs < MaxAbsMicro,
      s"embedding magnitude too large for exact micro arithmetic: " +
        s"max |micro| = $maxAbs >= $MaxAbsMicro (|x| must stay < 1000)")
    val meanU = new Array[Long](d)
    meanRows.foreach(r => meanU(r.getInt(0)) = r.getLong(1))
    // pass 2: exact integer scatter — row-major outer product of the
    // centered micro vector, generated map-side and hash-aggregated
    // over d² keys (partial agg keeps the shuffle bounded at d² rows
    // per map task regardless of corpus size)
    val centered = zip_with(col("mu"), typedLit(meanU.toSeq),
      (a, b) => a - b)
    val aRows = vecs.select(centered.as("c"))
      .select(posexplode(flatten(transform(col("c"),
        ci => transform(col("c"), cj => ci * cj)))).as(Seq("pos", "p")))
      .groupBy("pos")
      .agg(sum(col("p").cast("decimal(38,0)")).as("s"))
      // exact decimal → IEEE double, then /n and the micro² rescale:
      // the same three-step expression the oracle casts
      .select(col("pos"),
        (col("s").cast("double") / lit(n.toDouble) / lit(1e12)).as("a"))
      .collect()
    val a = new Array[Double](d * d)
    aRows.foreach(r => a(r.getInt(0)) = r.getDouble(1))

    solve(a, d, n, meanU, k, iters)
  }

  /** The driver eigen-loop over a collected scatter-over-n matrix:
    * every fold order below is replayed verbatim by PcaOracles
    * (ascending-index sums, strict-> argmax, the 1e-12 norm guard, the
    * ascending-j Gram–Schmidt sweeps). Shared by [[fit]] and
    * [[fitFromStats]] — bit-identical inputs give bit-identical
    * models. */
  private def solve(a: Array[Double], d: Int, n: Long, meanU: Array[Long],
      k: Int, iters: Int): Model = {
    def matvec(m: Array[Double], v: Array[Double]): Array[Double] = {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += m(i * d + j) * v(j); j += 1 }
        y(i) = s
        i += 1
      }
      y
    }
    def dotAsc(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { s += x(i) * y(i); i += 1 }
      s
    }
    var trace = 0.0
    locally { var i = 0; while (i < d) { trace += a(i * d + i); i += 1 } }
    // init anchor: largest diagonal entry (strict >, first wins);
    // component c starts from the basis vector (idx0 + c) mod d so no
    // start is exactly inside the span of already-found components
    var idx0 = 0
    locally { var i = 1; while (i < d) { if (a(i * d + i) > a(idx0 * d + idx0)) idx0 = i; i += 1 } }
    val qs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val lams = Array.newBuilder[Double]
    for (c <- 0 until k) {
      var v = Array.tabulate(d)(i => if (i == (idx0 + c) % d) 1.0 else 0.0)
      for (_ <- 1 to iters) {
        val y = matvec(a, v)
        // Gram–Schmidt against every FOUND component, ascending, each
        // projection fully subtracted before the next — orthogonality
        // holds by construction at every step (plain power-with-
        // deflation stalls on near-flat spectra; orthogonal iteration
        // converges per spectral gap and keeps the basis orthonormal
        // regardless)
        var j = 0
        while (j < c) {
          val dj = dotAsc(qs(j), y)
          var i = 0
          while (i < d) { y(i) = y(i) - dj * qs(j)(i); i += 1 }
          j += 1
        }
        var nrm = math.sqrt(dotAsc(y, y))
        if (!(nrm > 1e-12)) nrm = 1e-12
        v = y.map(_ / nrm)
      }
      val lam = dotAsc(v, matvec(a, v))
      // sign canonicalization: largest |entry| (strict >, first wins)
      // becomes positive; negation is IEEE-exact, so later Gram–Schmidt
      // sweeps against the flipped vector produce bit-identical results
      var mi = 0
      locally { var i = 1; while (i < d) { if (math.abs(v(i)) > math.abs(v(mi))) mi = i; i += 1 } }
      if (v(mi) < 0) v = v.map(x => -x)
      qs += v
      lams += lam
    }
    // output order: eigenvalue descending, found-order on ties — on a
    // near-degenerate spectrum the fixed-iteration Rayleigh quotients
    // of trailing components can land out of order; the permutation is
    // deterministic and the oracle replays it as a rank window
    val lams0 = lams.result()
    val order = lams0.indices
      .sortWith((x, y) => lams0(x) > lams0(y) || (lams0(x) == lams0(y) && x < y))
    Model(d, n, meanU, order.map(qs(_)).toArray,
      order.map(lams0(_)).toArray, trace)
  }

  /** The fitted components as (component, dim, w) — w is the micro
    * weight back in value units (w_u/1e6, the exact grid projection
    * multiplies on). */
  def componentsDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    val wu = model.compU
    (for (c <- wu.indices; i <- 0 until model.dim)
      yield (c, i, wu(c)(i))).toDF("component", "dim", "w_u")
      .select(col("component"), col("dim"),
        (col("w_u").cast("double") / lit(1e6)).as("w"))
  }

  /** Eigenvalue report: (component, lambda, var_share) — lambda the
    * raw IEEE Rayleigh quotient, share against the covariance trace
    * (guarded like every norm). `+ 0.0` pins any −0.0 to +0.0 on both
    * engines. */
  def eigenvaluesDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    val tr = if (model.trace > 1e-12) model.trace else 1e-12
    model.lambdas.zipWithIndex
      .map { case (l, c) => (c, l, l / tr) }.toSeq
      .toDF("component", "lambda", "var_share")
      .select(col("component"), (col("lambda") + lit(0.0)).as("lambda"),
        (col("var_share") + lit(0.0)).as("var_share"))
  }

  /** Project every row onto the components — map-side only: mean and
    * micro weights ride the plan as literal arrays; per component one
    * EXACT integer dot (centered micro × micro weight, LONG
    * accumulation) rescaled once to value units. Output columns
    * p0..p{k−1}. */
  def project(df: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame = {
    val d = model.dim
    val wu = model.compU
    // one codegen'd kernel call per row (micro-quantize, center,
    // k exact LONG dots) — replaces k interpreted zip_with+aggregate
    // folds with bit-identical arithmetic
    val arr = graft.functions.GraftFunctions.pca_project_k(
      col(vecCol).cast("array<double>"),
      typedLit(model.meanU.toSeq),
      typedLit(wu.flatten.toSeq))
    val base = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === d)
      .select(col(idCol).as("vec_id"), arr.as("__p"))
    val projCols = wu.indices.map(c => element_at(col("__p"), c + 1).as(s"p$c"))
    base.select(col("vec_id") +: projCols: _*)
  }

  /** Whitened projection: each component's exact-integer projection
    * divided by √λ (norm-guarded like every scale) so the output
    * coordinates have ~unit variance — the standard decorrelated
    * representation fed to clustering/SemDeDup/OPQ. Map-side like
    * [[project]]; the scales are IEEE-deterministic functions of the
    * Rayleigh quotients, so the oracle reproduces them exactly.
    * Output columns w0..w{k−1}. Requires a model with eigenvalues
    * (a fresh [[fit]] — the persisted serve model stores only
    * projection integers). */
  def whiten(df: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame = {
    require(!model.lambdas.exists(_.isNaN),
      "whiten needs a model with eigenvalues (a fresh fit; the " +
        "persisted model stores only the projection integers)")
    val p = project(df, vecCol, idCol, model)
    val cols = model.lambdas.indices.map { c =>
      val scale = math.sqrt(
        if (model.lambdas(c) > 1e-12) model.lambdas(c) else 1e-12)
      (col(s"p$c") / lit(scale)).as(s"w$c")
    }
    p.select(col("vec_id") +: cols: _*)
  }

  /** Persist a fitted model: (component, dim, w_u) rows for the k
    * components plus component = −1 rows carrying the integer mean —
    * every number the projection consumes, so serving is bit-identical
    * by construction. */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    val wu = model.compU
    val compRows = for (c <- wu.indices; i <- 0 until model.dim)
      yield (c, i, wu(c)(i))
    val meanRows = model.meanU.zipWithIndex.map { case (m, i) => (-1, i, m) }
    (compRows ++ meanRows).toDF("component", "dim", "w_u")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load the projection-relevant part of a persisted model (bounded
    * collect: (k+1)·d rows). Eigen metadata is not persisted — the
    * serve path only projects. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("component", "dim", "w_u").collect()
    val d = rows.map(_.getInt(1)).max + 1
    val k = rows.map(_.getInt(0)).max + 1
    val meanU = new Array[Long](d)
    val comps = Array.fill(k)(new Array[Double](d))
    rows.foreach { r =>
      val (c, i, w) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (c == -1) meanU(i) = w else comps(c)(i) = w / 1e6
    }
    Model(d, -1L, meanU, comps, Array.fill(k)(Double.NaN), Double.NaN)
  }

  /** [[project]] under a persisted model — micro weights round-trip
    * parquet exactly, so this is bit-identical to projecting with the
    * fresh model. */
  def projectFromModel(spark: SparkSession, df: DataFrame, vecCol: String,
      idCol: String, path: String): DataFrame =
    project(df, vecCol, idCol, loadModel(spark, path))

  // ------------------------------------------- incremental statistics

  /**
   * ADDITIVE sufficient statistics of one batch, as rows
   * `(stat, idx, val DECIMAL(38,0))`:
   *
   *  - `n`   (idx 0): row count
   *  - `sum` (idx i): per-dimension micro sum
   *  - `mx`  (idx i): per-dimension max |micro| (merges by MAX — the
   *          magnitude guard)
   *  - `raw` (idx i·d+j): UNCENTERED micro second moments Σ μ_i·μ_j
   *
   * Everything is an exact integer, so states from ANY batch split
   * merge (sum / max) to exactly the totals of one pass over the
   * union — incremental fitting is bit-identical to a batch refit
   * ([[fitFromStats]]), which is what lets the streaming trainer
   * ([[graft.streaming.StreamingPca]]) share the batch oracle.
   * Two corpus passes per batch, the same shapes as [[fit]].
   */
  def batchStats(df: DataFrame, vecCol: String, idCol: String,
      d: Int): DataFrame = {
    val vecs = graft.operators.Materialized(microFrame(df, vecCol, idCol, d))
    val dims = vecs.select(posexplode(col("mu")).as(Seq("dim", "m")))
      .groupBy("dim")
      .agg(sum(col("m").cast("decimal(38,0)")).as("s"),
        max(abs(col("m"))).cast("decimal(38,0)").as("mx"),
        count(lit(1)).cast("decimal(38,0)").as("cnt"))
    val sums = dims.select(lit("sum").as("stat"), col("dim").as("idx"),
      col("s").as("val"))
    val mxs = dims.select(lit("mx").as("stat"), col("dim").as("idx"),
      col("mx").as("val"))
    val nRow = dims.filter(col("dim") === 0)
      .select(lit("n").as("stat"), lit(0).as("idx"), col("cnt").as("val"))
    val raws = vecs
      .select(posexplode(flatten(transform(col("mu"),
        mi => transform(col("mu"), mj => mi * mj)))).as(Seq("pos", "p")))
      .groupBy(col("pos").as("idx"))
      .agg(sum(col("p").cast("decimal(38,0)")).as("val"))
      .select(lit("raw").as("stat"), col("idx"), col("val"))
    nRow.unionByName(sums).unionByName(mxs).unionByName(raws)
  }

  /**
   * Fit from accumulated statistics (any union of [[batchStats]]
   * frames, e.g. the growing stats index of a stream) —
   * BIT-IDENTICAL to [[fit]] over the concatenated batches:
   * the centered scatter derives from the raw moments by the exact
   * integer identity Σ(μ_i−m̄_i)(μ_j−m̄_j) =
   * raw_ij − m̄_j·sum_i − m̄_i·sum_j + n·m̄_i·m̄_j, the integer mean
   * uses the same in-plan floor expression, and the decimal→double
   * conversion goes through the same in-plan cast, so [[solve]]
   * receives the same matrix.
   */
  def fitFromStats(spark: SparkSession, stats: DataFrame, k: Int = 4,
      iters: Int = 32): Model = {
    val totals = stats.groupBy("stat", "idx")
      .agg(sum("val").as("sv"), max("val").as("mv"))
      .select(col("stat"), col("idx"),
        when(col("stat") === "mx", col("mv")).otherwise(col("sv")).as("val"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDecimal(2))).toSeq
    val byStat = totals.groupBy(_._1)
    require(byStat.contains("n") && byStat.contains("sum") &&
      byStat.contains("mx") && byStat.contains("raw"),
      "stats frame is missing required rows")
    val n = byStat("n").head._3.toBigInteger.longValueExact()
    require(n > 0, "no rows in the accumulated statistics")
    val sums = byStat("sum").sortBy(_._2)
    val d = sums.size
    require(k <= d, s"k=$k exceeds embedding dimension $d")
    val maxAbs = byStat("mx").map(_._3.toBigInteger.longValueExact()).max
    require(maxAbs < MaxAbsMicro,
      s"embedding magnitude too large for exact micro arithmetic: " +
        s"max |micro| = $maxAbs >= $MaxAbsMicro (|x| must stay < 1000)")
    // bounded (idx, DECIMAL(38,0)) local relation — EXPLICIT schema:
    // the tuple-encoder default of DECIMAL(38,18) has only 20 integer
    // digits and would overflow raw moments at corpus scale
    def localDec(rows: Seq[(Int, java.math.BigDecimal)]): DataFrame = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.DecimalType(38, 0), nullable = false)))
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(
          rows.map(r => org.apache.spark.sql.Row(r._1, r._2)): _*)), schema)
    }
    // integer mean via the same in-plan floor expression as fit
    val meanU = new Array[Long](d)
    localDec(sums.map { case (_, i, s) => (i, s) })
      .select(col("idx"),
        floor(col("s").cast("double") / lit(n.toDouble) + lit(0.5))
          .cast("long").as("mb"))
      .collect().foreach(r => meanU(r.getInt(0)) = r.getLong(1))
    // centered scatter by the exact integer identity, then the same
    // in-plan decimal→double/n/1e12 conversion fit's aggregation uses
    val sumI = new Array[BigInt](d)
    sums.foreach { case (_, i, s) => sumI(i) = BigInt(s.toBigInteger) }
    val rawI = new Array[BigInt](d * d)
    byStat("raw").foreach { case (_, p, s) => rawI(p) = BigInt(s.toBigInteger) }
    val cent = for (i <- 0 until d; j <- 0 until d) yield {
      val s = rawI(i * d + j) - BigInt(meanU(j)) * sumI(i) -
        BigInt(meanU(i)) * sumI(j) + BigInt(n) * BigInt(meanU(i)) * BigInt(meanU(j))
      (i * d + j, new java.math.BigDecimal(s.bigInteger))
    }
    val a = new Array[Double](d * d)
    localDec(cent)
      .select(col("idx"),
        (col("s").cast("double") / lit(n.toDouble) / lit(1e12)).as("a"))
      .collect().foreach(r => a(r.getInt(0)) = r.getDouble(1))
    solve(a, d, n, meanU, k, iters)
  }
}
