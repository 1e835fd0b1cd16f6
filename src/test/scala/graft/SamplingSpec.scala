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
}
