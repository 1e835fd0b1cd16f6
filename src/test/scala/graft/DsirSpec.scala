package graft

import graft.text.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  import spark.implicits._

  /** Target speaks vocab A; raw docs either echo vocab A or speak
    * vocab B. The importance weight must rank the A-ish raw docs above
    * the B-ish ones. */
  private lazy val corpus = {
    val target = (0L until 40L).map(i =>
      (i, "alpha beta gamma delta alpha beta", true))
    val rawLikeTarget = (100L until 120L).map(i =>
      (i, "alpha beta gamma delta epsilon", false))
    val rawOffTarget = (200L until 220L).map(i =>
      (i, "omega psi chi phi upsilon tau", false))
    (target ++ rawLikeTarget ++ rawOffTarget)
      .toDF("doc_id", "text", "is_t")
  }

  test("importanceWeights ranks target-like raw docs above off-target ones") {
    val w = Dsir.importanceWeights(corpus, "text", "doc_id", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // target docs are never scored
    assert(w.keySet.forall(_ >= 100L))
    val likeT = w.filter(_._1 < 200L).values
    val offT = w.filter(_._1 >= 200L).values
    assert(likeT.min > offT.max,
      s"every target-like weight (min ${likeT.min}) must beat every " +
        s"off-target weight (max ${offT.max})")
  }

  test("weights are deterministic across repartitioning") {
    val a = Dsir.importanceWeights(corpus, "text", "doc_id", col("is_t"))
      .orderBy("doc_id").collect()
    val b = Dsir.importanceWeights(corpus.repartition(9), "text", "doc_id",
      col("is_t")).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("kernel cells are row-identical to the expression twin on real docs") {
    val docs = Demo.table(spark, sf("sf0.001"), "documents")
    val k = docs.select(col("doc_id"),
      graft.text.Dsir.gramCellsPublicForTest(col("text"), 1024).as("c"))
    val e = docs.select(col("doc_id"),
      graft.text.Dsir.gramCellsExpr(col("text"), 1024).as("c"))
    assert(k.exceptAll(e).count() == 0 && e.exceptAll(k).count() == 0)
  }

  test("zero-gram raw docs are excluded; n_grams counts instances") {
    val withEmpty = corpus.union(Seq((300L, "   ", false))
      .toDF("doc_id", "text", "is_t"))
    val out = Dsir.importanceWeights(withEmpty, "text", "doc_id", col("is_t"))
    assert(out.filter(col("doc_id") === 300L).count() == 0)
    // "alpha beta gamma delta epsilon": 5 unigrams + 4 bigrams
    val n = out.filter(col("doc_id") === 100L).select("n_grams")
      .as[Long].head()
    assert(n == 9L)
  }
}
