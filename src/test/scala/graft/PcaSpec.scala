package graft

import graft.embeddings.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  import spark.implicits._

  private def realEmbeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  // Independent covariance computation written against the OPERATOR
  // SPEC (micro quantization, integer mean, scatter/n) in plain Scala
  // collections — shares no code with the engine's aggregation plan.
  private def refCov(vecs: Seq[Array[Float]]): Array[Array[Double]] = {
    val d = vecs.head.length
    val n = vecs.size
    val mu = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val mb = Array.tabulate(d) { i =>
      math.floor(mu.map(v => BigInt(v(i))).sum.toDouble / n + 0.5).toLong
    }
    Array.tabulate(d, d) { (i, j) =>
      mu.map(v => BigInt((v(i) - mb(i)) * (v(j) - mb(j)))).sum.toDouble /
        n / 1e12
    }
  }

  // Deterministic corpus with a GAPPED spectrum: four orthonormal
  // directions (test-local Gram–Schmidt) carrying geometrically
  // decaying amplitudes 8/4/2/1 driven by an LCG-ish coefficient grid.
  private def gappedCorpus: Seq[(Long, Array[Float])] = {
    val d = 16
    val raw = Seq(
      Array.tabulate(d)(i => 1.0 + i),
      Array.tabulate(d)(i => math.pow(-1.0, i) * (2.0 + (i % 5))),
      Array.tabulate(d)(i => if (i < 8) 1.0 else -0.5),
      Array.tabulate(d)(i => ((i * 7) % 11) - 5.0))
    val u = raw.foldLeft(Vector.empty[Array[Double]]) { (acc, r) =>
      val w = r.clone()
      acc.foreach { q =>
        val dp = w.zip(q).map { case (a, b) => a * b }.sum
        w.indices.foreach(i => w(i) -= dp * q(i))
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      acc :+ w.map(_ / nrm)
    }
    val s = Array(8.0, 4.0, 2.0, 1.0)
    (0 until 400).map { r =>
      def g(m: Int): Double = ((r * 31 + m * 17) % 1000 - 500) / 500.0
      val x = new Array[Float](d)
      for (i <- 0 until d; m <- 0 until 4)
        x(i) = x(i) + (s(m) * g(m) * u(m)(i)).toFloat
      (r.toLong, x)
    }
  }

  test("components and eigenvalues match an independent eigensolver (breeze) on a gapped spectrum") {
    val data = gappedCorpus
    val df = data.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", "vec_id", k = 4, iters = 32)
    val cov = refCov(data.map(_._2))
    val d = model.dim
    val bm = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => cov(i)(j))
    val eig = breeze.linalg.eigSym(bm)
    // breeze returns eigenvalues ascending; take the top 4 descending
    val order = eig.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(4)
    // the construction must actually be gapped, else the test is vacuous
    order.map(_._1).sliding(2).foreach { case Array(a, b) =>
      assert(a >= 1.5 * b, s"spectrum not gapped: ${order.map(_._1).mkString(",")}")
    }
    order.zipWithIndex.foreach { case ((lam, colIdx), c) =>
      assert(math.abs(model.lambdas(c) - lam) <= 1e-6 * math.abs(lam),
        s"eigenvalue $c: power ${model.lambdas(c)} vs breeze $lam")
      val bv = Array.tabulate(d)(i => eig.eigenvectors(i, colIdx))
      // eigenvectors defined up to sign: compare |cosine|
      val dot = (0 until d).map(i => model.comps(c)(i) * bv(i)).sum
      assert(math.abs(dot) >= 1.0 - 1e-6,
        s"component $c misaligned with breeze eigenvector: |cos| = ${math.abs(dot)}")
    }
  }

  test("planted dominant direction is recovered with canonical sign; spectrum ordered") {
    val d = 8
    // independent coefficients: strong spread along u = (1,1,0,…)/√2,
    // weak along w = (1,−1,0,…)/√2 — the exact principal axes
    val rows = (for (t <- -20 to 20; s <- -3 to 3) yield {
      Array.tabulate(d)(i =>
        if (i == 0) (0.5 * t + 0.01 * s).toFloat
        else if (i == 1) (0.5 * t - 0.01 * s).toFloat
        else 0.0f)
    }).zipWithIndex.map { case (v, id) => (id.toLong, v) }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", "vec_id", k = 2, iters = 32)
    val c0 = model.comps(0)
    assert(math.abs(c0(0) - math.sqrt(0.5)) < 1e-6 &&
      math.abs(c0(1) - math.sqrt(0.5)) < 1e-6,
      s"first component ${c0.take(3).mkString(",")} not along (1,1)/√2")
    // canonical sign: the largest-|entry| coordinate is positive
    model.comps.foreach { v =>
      val mi = v.indices.maxBy(i => math.abs(v(i)))
      assert(v(mi) > 0, s"sign not canonical: ${v.mkString(",")}")
    }
    assert(model.lambdas(0) > model.lambdas(1) && model.lambdas(1) >= -1e-12)
    val c1 = model.comps(1)
    assert(math.abs(c1(0) - math.sqrt(0.5)) < 1e-6 &&
      math.abs(c1(1) + math.sqrt(0.5)) < 1e-6,
      s"second component ${c1.take(3).mkString(",")} not along (1,-1)/√2")
  }

  test("components are orthonormal on a flat spectrum too; shares bounded; fit is partitioning-invariant") {
    val df = realEmbeddings // near-flat random spectrum — the hard case
    val model = Pca.fit(df, "embedding", "vec_id", k = 4, iters = 32)
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until model.dim).map(i => model.comps(a)(i) * model.comps(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9, s"|c$a|^2 = $dot")
      else assert(math.abs(dot) < 1e-9, s"c$a . c$b = $dot")
    }
    (0 until 3).foreach(c => assert(model.lambdas(c) >= model.lambdas(c + 1),
      s"spectrum not ordered: ${model.lambdas.mkString(",")}"))
    val shares = model.lambdas.map(_ / model.trace)
    assert(shares.forall(s => s >= 0 && s <= 1) && shares.sum <= 1 + 1e-9)
    // exact-integer statistics → identical model under any partitioning
    val m7 = Pca.fit(df.repartition(7), "embedding", "vec_id", k = 4, iters = 32)
    assert(m7.comps.flatten.toSeq === model.comps.flatten.toSeq)
    assert(m7.lambdas.toSeq === model.lambdas.toSeq)
    assert(m7.meanU.toSeq === model.meanU.toSeq)
  }

  test("projection equals the exact integer dot per row; variance along c0 matches λ0") {
    val df = realEmbeddings
    val model = Pca.fit(df, "embedding", "vec_id", k = 4, iters = 32)
    val wu = model.compU
    val proj = Pca.project(df, "embedding", "vec_id", model)
      .orderBy("vec_id").collect()
    val raw = df.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(proj.length === raw.length && proj.nonEmpty)
    proj.zip(raw).foreach { case (p, (id, v)) =>
      assert(p.getLong(0) === id)
      val c = v.zipWithIndex.map { case (x, i) =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong - model.meanU(i) }
      for (k <- 0 until 4) {
        val s = c.zip(wu(k)).map { case (a, b) => a * b }.sum
        assert(p.getDouble(k + 1) === s.toDouble / 1e12, s"vec $id p$k")
      }
    }
    // population variance of the first projection ≈ λ0 (the projection
    // grid and the micro mean differ from the raw statistic only at
    // micro rounding; λ0 is the Rayleigh quotient of the SAME vector)
    val p0 = proj.map(_.getDouble(1))
    val mean0 = p0.sum / p0.length
    val v0 = p0.map(x => (x - mean0) * (x - mean0)).sum / p0.length
    assert(math.abs(v0 - model.lambdas(0)) <= 0.02 * model.lambdas(0),
      s"var(p0) = $v0 vs lambda0 = ${model.lambdas(0)}")
  }

  test("whitening yields ~unit variance per component and ~zero cross-covariance") {
    val df = realEmbeddings
    val model = Pca.fit(df, "embedding", "vec_id", k = 4, iters = 32)
    val w = Pca.whiten(df, "embedding", "vec_id", model)
      .orderBy("vec_id").collect()
    val cols = (0 until 4).map(c => w.map(_.getDouble(c + 1)))
    val n = w.length
    cols.zipWithIndex.foreach { case (xs, c) =>
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(v - 1.0) < 0.03, s"var(w$c) = $v")
    }
    for (a <- 0 until 4; b <- (a + 1) until 4) {
      val (xa, xb) = (cols(a), cols(b))
      val (ma, mb) = (xa.sum / n, xb.sum / n)
      val cov = xa.zip(xb).map { case (x, y) => (x - ma) * (y - mb) }.sum / n
      assert(math.abs(cov) < 0.05, s"cov(w$a, w$b) = $cov")
    }
    // equals the plain projection rescaled by the guarded 1/sqrt(lambda)
    val p = Pca.project(df, "embedding", "vec_id", model)
      .orderBy("vec_id").collect()
    w.zip(p).foreach { case (wr, pr) =>
      for (c <- 0 until 4) {
        val scale = math.sqrt(
          if (model.lambdas(c) > 1e-12) model.lambdas(c) else 1e-12)
        assert(wr.getDouble(c + 1) === pr.getDouble(c + 1) / scale)
      }
    }
    // the persisted serve model has no eigenvalues - whiten must refuse
    val path = java.nio.file.Files
      .createTempDirectory("pca_whiten").toString + "/m"
    Pca.writeModel(spark, model, path)
    val e = intercept[IllegalArgumentException] {
      Pca.whiten(df, "embedding", "vec_id", Pca.loadModel(spark, path))
    }
    assert(e.getMessage.contains("eigenvalues"))
  }

  test("persisted model serves bit-identically") {
    val df = realEmbeddings
    val model = Pca.fit(df, "embedding", "vec_id", k = 4, iters = 32)
    val path = java.nio.file.Files
      .createTempDirectory("pca_model").toString + "/pca"
    Pca.writeModel(spark, model, path)
    val fresh = Pca.project(df, "embedding", "vec_id", model)
      .orderBy("vec_id").collect().toSeq
    val served = Pca.projectFromModel(spark, df, "embedding", "vec_id", path)
      .orderBy("vec_id").collect().toSeq
    assert(served === fresh)
  }

  test("incremental fit from batch statistics is bit-identical to the batch fit, in any batch order") {
    val df = realEmbeddings
    val batch = Pca.fit(df, "embedding", "vec_id", k = 4, iters = 32)
    val d = batch.dim
    val parts = (0 until 3).map(b =>
      Pca.batchStats(df.filter(col("vec_id") % 3 === b), "embedding",
        "vec_id", d))
    val inc = Pca.fitFromStats(spark,
      parts(0).unionByName(parts(1)).unionByName(parts(2)), k = 4, iters = 32)
    assert(inc.n === batch.n)
    assert(inc.meanU.toSeq === batch.meanU.toSeq)
    assert(inc.comps.flatten.toSeq === batch.comps.flatten.toSeq)
    assert(inc.lambdas.toSeq === batch.lambdas.toSeq)
    assert(inc.trace === batch.trace)
    // additive statistics: merge order cannot matter
    val rev = Pca.fitFromStats(spark,
      parts(2).unionByName(parts(0)).unionByName(parts(1)), k = 4, iters = 32)
    assert(rev.comps.flatten.toSeq === batch.comps.flatten.toSeq)
    assert(rev.lambdas.toSeq === batch.lambdas.toSeq)
    // the guard rides the stats too
    val hot = Seq((999L, Array.fill(d)(2000.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.fitFromStats(spark,
        parts(0).unionByName(Pca.batchStats(hot, "embedding", "vec_id", d)),
        k = 4, iters = 32)
    }
    assert(e.getMessage.contains("micro"))
  }

  test("magnitude guard rejects embeddings outside the exact-arithmetic range") {
    val df = Seq((1L, Array.fill(4)(2000.0f)), (2L, Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(df, "embedding", "vec_id", k = 1, iters = 2)
    }
    assert(e.getMessage.contains("micro"))
  }

  test("serve-time kernel rejects out-of-range and non-finite NEW frames (fit only guards the training corpus)") {
    val train = realEmbeddings
    val model = Pca.fit(train, "embedding", "vec_id", k = 2, iters = 8)
    // |x| >= 1000 saturates the micro quantization; NaN/Inf would ride
    // through floor(..).toLong silently — both must fail loud at serve
    val d = model.dim
    for (bad <- Seq(Array.fill(d)(5000.0f),
        Array.tabulate(d)(i => if (i == 3) Float.NaN else 1.0f))) {
      val df = Seq((1L, bad)).toDF("vec_id", "embedding")
      val e = intercept[Exception] {
        Pca.project(df, "embedding", "vec_id", model).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("pca_project")), msgs(e).mkString("; "))
    }
    // in-range serves still work untouched
    assert(Pca.project(Seq((1L, Array.fill(d)(1.0f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", model).collect().length === 1)
  }
}
