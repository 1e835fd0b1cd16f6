package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def collectHH(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.collect().head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))

  test("exact regime: k above distinct count reproduces group-by counts") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("v").repartition(4)
    val hh = collectHH(df.agg(GraftFunctions.heavy_hitters(col("v"), 8)))
    assert(hh == Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("approximate regime: true heavy hitters survive, error bounded") {
    // 1000 rows: one item at 400, one at 300, 300 singletons. k=8:
    // anything above n/(k+1) ≈ 111 must be retained, with count
    // underestimated by at most the decrement total (< n/(k+1)).
    val rows = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 300).map(i => s"rare$i")
    val df = rows.toDF("v").repartition(4)
    val hh = collectHH(df.agg(GraftFunctions.heavy_hitters(col("v"), 8))).toMap
    val bound = rows.size / (8 + 1)
    assert(hh.contains("hot1") && hh.contains("hot2"))
    assert(hh("hot1") <= 400 && hh("hot1") >= 400 - bound)
    assert(hh("hot2") <= 300 && hh("hot2") >= 300 - bound)
    assert(hh.size <= 8)
  }

  test("null items are ignored; grouped aggregation works per key") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", null), ("g2", "y"))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(GraftFunctions.heavy_hitters(col("v"), 4).as("hh"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Row](1).map(r => (r.getString(0), r.getLong(1)))
      == Seq(("x", 2L)))
    assert(out(1).getSeq[Row](1).map(r => (r.getString(0), r.getLong(1)))
      == Seq(("y", 1L)))
  }

  test("SQL surface: heavy_hitters registered as an aggregate function") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("hh_in")
    val r = spark.sql(
      "SELECT heavy_hitters(v, 4) AS hh FROM hh_in").collect().head
    assert(r.getSeq[Row](0).map(x => (x.getString(0), x.getLong(1)))
      == Seq(("a", 2L), ("b", 1L)))
  }
}
