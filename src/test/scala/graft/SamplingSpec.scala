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

  test("split partitions the keys disjointly and exhaustively") {
    val out = Sampling.split(docs, "doc_id", 0.7, 0.2, 0.1)
    assert(out.count() == docs.count())
    val labels = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
    // each doc appears exactly once with exactly one label
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }
}
