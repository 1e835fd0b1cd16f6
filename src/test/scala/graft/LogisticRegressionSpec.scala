package graft

import graft.text.LogisticRegression
import org.apache.spark.sql.functions._

class LogisticRegressionSpec extends SparkSpec {

  import spark.implicits._

  test("planted separable corpus: held-out predictions perfect, probabilities saturated") {
    val docs = ((0L until 30L).map(i => (i, "alpha beta gamma delta", true)) ++
      (30L until 60L).map(i => (i, "foo bar baz qux", false)))
      .toDF("doc_id", "text", "hi")
    val pred = LogisticRegression.predict(docs, "text", "doc_id",
      col("hi"), buckets = 32).collect()
    assert(pred.nonEmpty)
    pred.foreach { r =>
      val (y, p, yp) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(yp === y, s"doc ${r.getLong(0)} mispredicted")
      if (y == 1L) assert(p > 0.9, s"positive prob $p not saturated")
      else assert(p < 0.1, s"negative prob $p not saturated")
    }
  }

  test("calibration under duplicated evidence: LR tracks the true rate where NB saturates") {
    // The correlated-feature trap: every document repeats its marker
    // word 5 times, and the marker only predicts the label at 70/30.
    // NB multiplies the SAME evidence in 5 times (token instances) →
    // posterior ≈ 0.7⁵/(0.7⁵+0.3⁵) ≈ 0.99; LR's PRESENCE features see
    // the marker once and descend to the observed rate ≈ 0.7.
    val docs = (0L until 100L).map { i =>
      if (i % 2 == 0) (i, "good good good good good", (i / 2) % 10 < 7)
      else (i, "bad bad bad bad bad", (i / 2) % 10 >= 7)
    }.toDF("doc_id", "text", "y")
    val pred = LogisticRegression.predict(docs, "text", "doc_id",
      col("y"), buckets = 32).collect()
    val pA = pred.filter(_.getLong(0) % 2 == 0).map(_.getDouble(2))
    assert(pA.nonEmpty)
    val meanA = pA.sum / pA.length

    // NB posterior for a type-A doc, computed INDEPENDENTLY from first
    // principles over the same train slice and smoothing rule as
    // nbPredict (Laplace +1, V = observed vocab = 2):
    //   P(c|d) ∝ (Nc/N) · Π_t ((cnt(t,c)+1)/(tokens_c+V))^{n_t(d)}
    val train = docs.withColumn("_bk",
        graft.operators.Sampling.bucket(col("doc_id")))
      .filter(col("_bk") < 8000)
      .select("doc_id", "text", "y").collect()
    val n1 = train.count(_.getBoolean(2)).toDouble
    val n0 = train.length - n1
    def cnt(word: String, pos: Boolean): Double =
      train.filter(r => r.getBoolean(2) == pos)
        .map(r => r.getString(1).split(" ").count(_ == word)).sum.toDouble
    val (tok1, tok0) = (cnt("good", true) + cnt("bad", true),
      cnt("good", false) + cnt("bad", false))
    def lik(c: Boolean): Double = {
      val prior = (if (c) n1 else n0) / train.length
      val pGood = (cnt("good", c) + 1) / ((if (c) tok1 else tok0) + 2)
      prior * math.pow(pGood, 5)
    }
    val nbPosterior = lik(true) / (lik(true) + lik(false))
    assert(nbPosterior > 0.9,
      s"NB should saturate under duplicated evidence, got $nbPosterior")
    assert(math.abs(meanA - 0.7) < 0.1,
      s"LR should track the true 0.7 rate, got $meanA")
    assert(math.abs(meanA - 0.7) < math.abs(nbPosterior - 0.7),
      s"LR ($meanA) should be better calibrated than NB ($nbPosterior)")
  }

  test("model is bounded at buckets+1 rows; serve-from-disk is bit-identical") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok${i % 7} tok${i % 11} filler words here", i % 3 == 0))
      .toDF("doc_id", "text", "y")
    val w = LogisticRegression.trainWeights(docs, "text", "doc_id",
      col("y"), buckets = 16)
    assert(w.count() <= 17)
    assert(w.filter(col("cell") === -1).count() === 1)
    val path = java.nio.file.Files
      .createTempDirectory("lrmodel").toString + "/m"
    LogisticRegression.writeModel(docs, "text", "doc_id", col("y"), path,
      buckets = 16)
    val fresh = LogisticRegression.predict(docs, "text", "doc_id",
      col("y"), buckets = 16).orderBy("doc_id").collect()
    val served = LogisticRegression.predictFromModel(docs, "text",
      "doc_id", col("y"), path, buckets = 16).orderBy("doc_id").collect()
    assert(fresh.toSeq === served.toSeq)
  }

  test("descent equals an independent driver-side reference implementation") {
    // Plain-Scala replica of the trainer: same hashed cells, same
    // decimal/rounding discipline, written against the MATH (maps and
    // loops), not the Column plan — an independent check that the
    // distributed descent computes the algorithm it claims.
    val docs = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "red fox jumps" else "blue crab swims",
        i % 2 == 0)).toDF("doc_id", "text", "y")
    val buckets = 16
    val iters = 5
    val step = 3.0

    def strHash(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 1000000007L
    }
    def cells(text: String): Set[Long] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val grams = toks ++ toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))
      grams.map(g => strHash(g) % buckets).toSet
    }
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10000L
    }
    def r6(x: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP))

    val train = (0L until 40L)
      .filter(bucketOf(_) < 8000)
      .map(i => (cells(if (i % 2 == 0) "red fox jumps" else "blue crab swims"),
        if (i % 2 == 0) 1 else 0))
    val n = train.length
    var wRef = Map.empty[Long, BigDecimal]
    var bRef = BigDecimal(0)
    for (_ <- 1 to iters) {
      val errs = train.map { case (cs, y) =>
        val z = cs.toSeq.map(c => wRef.getOrElse(c, BigDecimal(0))).sum + bRef
        val p = r6(1.0 / (1.0 + math.exp(-z.toDouble)))
        (cs, p - y)
      }
      val gradC = errs.flatMap { case (cs, e) => cs.map(_ -> e) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val gradB = errs.map(_._2).sum
      wRef = gradC.map { case (c, g) =>
        c -> (wRef.getOrElse(c, BigDecimal(0)) - r6(step * g.toDouble / n))
      }
      bRef = bRef - r6(step * gradB.toDouble / n)
    }

    val engine = LogisticRegression.trainWeights(docs, "text", "doc_id",
      col("y"), buckets = buckets, iters = iters, step = step)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(engine(-1L) === bRef)
    val engineCells = engine - (-1L)
    assert(engineCells.keySet === wRef.keySet)
    engineCells.foreach { case (c, v) =>
      assert(v === wRef(c), s"cell $c: engine $v vs reference ${wRef(c)}")
    }
  }
}
