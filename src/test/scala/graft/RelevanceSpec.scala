package graft

import graft.text.{LanguageModel, Relevance}
import org.apache.spark.sql.functions._

/** TF-IDF / BM25 / bigram-LM scoring against hand-computed values. */
class RelevanceSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    // 4 docs, tiny vocabulary: "rare" appears only in doc 4
    Seq(
      (1L, "apple banana apple"),
      (2L, "apple banana"),
      (3L, "banana banana banana"),
      (4L, "apple rare")).toDF("doc_id", "text")
  }

  test("tfidf: rare terms outweigh common ones; values match by hand") {
    val rows = Relevance.tfidf(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // df: apple=3, banana=3, rare=1; N=4
    val ln43 = math.log(4.0 / 3)
    assert(rows((1L, "apple")) == ((2L, 3L,
      BigDecimal(2 * ln43).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(rows((4L, "rare"))._3 ==
      BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // within doc 4: rare (ln 4 ≈ 1.386) beats apple (ln 4/3 ≈ 0.288)
    assert(rows((4L, "rare"))._3 > rows((4L, "apple"))._3)
  }

  test("topTerms: ranked by tfidf desc with term tie-break") {
    val top = Relevance.topTerms(corpus, "text", "doc_id", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(4L) == "rare")
    assert(top(1L) == "apple") // tf 2 beats banana tf 1
  }

  test("bm25: hand-computed single-term score, term absence gives no row") {
    val out = Relevance.bm25(corpus, "text", "doc_id", "rare")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(4L)) // only doc 4 contains "rare"
    // idf = ln(1 + (4-1+0.5)/(1+0.5)) = ln(10/3); tf=1, dl=2, avgdl=10/4
    val idf = math.log(1 + (4 - 1 + 0.5) / 1.5)
    val contrib = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.5))
    val want = BigDecimal(BigDecimal(contrib)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(4L) - want) < 1e-12)
  }

  test("bm25: multi-term scores are partitioning-invariant") {
    val a = Relevance.bm25(corpus, "text", "doc_id", "apple banana")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Relevance.bm25(corpus.repartition(7), "text", "doc_id",
      "apple banana").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b && a.keySet == Set(1L, 2L, 3L, 4L))
    // doc 3 (banana×3, no apple) must score below doc 2 (both terms)
    assert(a(2L) > a(3L))
  }

  test("bigrams: stream extraction drops short docs") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val bg = LanguageModel.bigrams(one, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bg.toSet == Set((1L, "a", "b"), (1L, "b", "c")))
  }

  test("lm scores: repeated corpus phrase scores above a rare transition") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick fox"), (2L, "the quick fox"), (3L, "the quick fox"),
      (4L, "fox the quick"), // starts with an unseen transition fox→the
      (5L, "the quick fox")).toDF("doc_id", "text")
    val out = LanguageModel.scoreDocs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 2) // two bigrams per doc
    assert(out(1L)._2 == out(2L)._2) // identical docs, identical score
    assert(out(1L)._2 > out(4L)._2) // fluent phrase beats rare transitions
  }

  test("lm scores on testdata: every doc scored, scores negative") {
    val out = LanguageModel.scoreDocs(
      Demo.table(spark, sf(), "documents"), "text", "doc_id")
    val n = out.count()
    assert(n == Demo.table(spark, sf(), "documents").count())
    assert(out.filter(col("lm_score") >= 0).count() == 0)
  }
}
