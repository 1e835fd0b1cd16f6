package graft

import graft.operators.Sampling
import graft.text.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  /** Separable synthetic corpus: label decides the vocabulary, so a
    * counting classifier that learns anything gets the held-out slice
    * fully right. 200 ids ensure both hash slices are populated. */
  private lazy val toyDocs = (0L until 200L).map { id =>
    val label = if (id % 2 == 0) "cats" else "dogs"
    val text =
      if (label == "cats") s"meow purr whiskers feline meow tuna$id"
      else s"woof bark fetch canine woof bone$id"
    (id, text, label)
  }.toDF("doc_id", "text", "lang")

  test("nbPredict: held-out slice only, labels from train, separable corpus is perfect") {
    val pred = Classifier.nbPredict(toyDocs, "text", "doc_id", "lang")
    val rows = pred.collect()
    val testIds = toyDocs
      .filter(Sampling.bucket(col("doc_id")) >= 8000)
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).toSet == testIds)
    assert(testIds.nonEmpty && testIds.size < 200)
    assert(rows.forall(r => r.getString(2) == r.getString(1)),
      "separable vocabularies must classify perfectly")
    assert(rows.forall(r => !r.isNullAt(3)))
  }

  test("nbPredict: prediction is deterministic across repartitioning") {
    val a = Classifier.nbPredict(toyDocs, "text", "doc_id", "lang")
      .orderBy("doc_id").collect()
    val b = Classifier.nbPredict(toyDocs.repartition(7), "text", "doc_id", "lang")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("nbPredict: all-out-of-vocab test doc falls back to the prior argmax") {
    // unique per-doc tokens -> every test doc scores on priors alone;
    // 2:1 class imbalance makes the prior argmax "big" deterministically
    val skew = (0L until 300L).map { id =>
      (id, s"tok${id}a tok${id}b", if (id % 3 == 0) "small" else "big")
    }.toDF("doc_id", "text", "lang")
    val pred = Classifier.nbPredict(skew, "text", "doc_id", "lang")
    assert(pred.count() > 0)
    assert(pred.filter(col("label_pred") =!= "big").count() == 0)
  }

  test("nbPredictFromModel serves bit-identical predictions from the persisted layout") {
    val path = java.nio.file.Files
      .createTempDirectory("nbmodel").toString
    Classifier.writeNbModel(toyDocs, "text", "doc_id", "lang", path)
    val fromModel = Classifier.nbPredictFromModel(toyDocs, "text",
      "doc_id", "lang", path).orderBy("doc_id").collect()
    val inMemory = Classifier.nbPredict(toyDocs, "text", "doc_id", "lang")
      .orderBy("doc_id").collect()
    assert(fromModel.sameElements(inMemory))
  }

  test("nbPredictHashed: separable corpus perfect; deterministic across partitioning") {
    val pred = Classifier.nbPredictHashed(toyDocs, "text", "doc_id", "lang")
    val rows = pred.orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(2) == r.getString(1)),
      "hashed features keep the separable corpus perfect")
    val again = Classifier.nbPredictHashed(toyDocs.repartition(7), "text",
      "doc_id", "lang").orderBy("doc_id").collect()
    assert(rows.sameElements(again))
  }

  test("nbPredictHashed: model stays bounded when vocabulary grows") {
    // corpus A: small vocab; corpus B: every doc contributes fresh terms
    // (~12x the vocab). The exact-vocab model grows with vocab; the
    // hashed model must stay within buckets x classes on BOTH.
    val buckets = 64
    def modelRows(df: org.apache.spark.sql.DataFrame): Long = {
      val base = df.select(col("doc_id"), col("lang").as("label"),
        graft.text.Dsir.gramCellsPublicForTest(col("text"), buckets).as("cells"),
        Sampling.bucket(col("doc_id")).as("_bk"))
      base.filter(col("_bk") < 8000)
        .select(col("label"), explode(col("cells")).as("cell"))
        .groupBy("label", "cell").count().count()
    }
    val bigVocab = (0L until 400L).map { id =>
      val label = if (id % 2 == 0) "cats" else "dogs"
      (id, (0 until 6).map(j => s"w${label}_${id}_$j").mkString(" "), label)
    }.toDF("doc_id", "text", "lang")
    assert(modelRows(toyDocs) <= buckets * 2)
    assert(modelRows(bigVocab) <= buckets * 2)
    // and the predictions over the fresh-vocab corpus still resolve
    val pred = Classifier.nbPredictHashed(bigVocab, "text", "doc_id",
      "lang", buckets = buckets)
    assert(pred.count() > 0)
  }

  test("accuracyReport: counts reconcile with predictions") {
    val pred = Classifier.nbPredict(toyDocs, "text", "doc_id", "lang")
    val rep = Classifier.accuracyReport(pred).collect()
    assert(rep.map(_.getLong(1)).sum == pred.count())
    rep.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
  }

  /** Axis-aligned clusters: label i concentrated on dimension i. */
  private lazy val toyVecs = (0L until 200L).map { id =>
    val label = (id % 3).toInt
    val base = Array.fill(8)(0.01f * ((id % 5) + 1))
    base(label) = 1.0f + 0.001f * (id % 7)
    (id, base.toSeq, label)
  }.toDF("vec_id", "embedding", "label")

  test("centroidPredict: separable clusters classify perfectly on the held-out slice") {
    val pred = Classifier.centroidPredict(toyVecs, "embedding", "vec_id", "label")
    val rows = pred.collect()
    val testIds = toyVecs
      .filter(Sampling.bucket(col("vec_id")) >= 8000)
      .select("vec_id").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).toSet == testIds && testIds.nonEmpty)
    assert(rows.forall(r => r.getInt(2) == r.getInt(1)))
    // cosine of a near-axis vector against its class centroid is high
    assert(rows.forall(_.getDouble(3) > 0.9))
  }

  test("centroidPredict: zero vectors and zero centroids score 0, never NaN") {
    val withZeros = (0L until 120L).map { id =>
      val label = (id % 2).toInt
      // label 1 is the all-zero class; some label-0 rows are zero too
      val v = if (label == 1 || id % 10 == 0) Array.fill(4)(0.0f)
        else Array(1.0f, 0.5f, 0.0f, 0.0f)
      (id, v.toSeq, label)
    }.toDF("vec_id", "embedding", "label")
    val rows = Classifier.centroidPredict(withZeros, "embedding",
      "vec_id", "label").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(!c.isNaN && c >= -1.0 && c <= 1.0)
    }
  }

  test("centroidPredictFromModel serves bit-identical predictions from disk") {
    val path = java.nio.file.Files
      .createTempDirectory("centmodel").toString + "/m"
    Classifier.writeCentroidModel(toyVecs, "embedding", "vec_id", "label", path)
    val fromModel = Classifier.centroidPredictFromModel(toyVecs, "embedding",
      "vec_id", "label", path).orderBy("vec_id").collect()
    val inMemory = Classifier.centroidPredict(toyVecs, "embedding",
      "vec_id", "label").orderBy("vec_id").collect()
    assert(fromModel.sameElements(inMemory))
  }

  test("centroidPredict: centroids are partition-order-independent") {
    val a = Classifier.centroidPredict(toyVecs, "embedding", "vec_id", "label")
      .orderBy("vec_id").collect()
    val b = Classifier.centroidPredict(toyVecs.repartition(11), "embedding",
      "vec_id", "label").orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }
}
