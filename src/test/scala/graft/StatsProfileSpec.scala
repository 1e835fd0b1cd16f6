package graft

import graft.etl.Stats
import org.apache.spark.sql.functions._

/** One-pass dataset profiling: exact metrics exact, approximate distinct
  * within HLL error bounds. */
class StatsProfileSpec extends SparkSpec {

  test("profile: exact counts/min/max/mean, approx distinct within 10%") {
    val docs = Demo.table(spark, sf("sf0.01"), "documents")
    val p = Stats.profile(docs).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet === docs.columns.toSet)

    val nRows = docs.count()
    val exactDistinctText = docs.select(countDistinct(col("text")))
      .collect().head.getLong(0)
    val textRow = p("text")
    assert(textRow.getAs[Long]("n_rows") === nRows)
    assert(textRow.getAs[Long]("n_non_null") === docs.filter(
      col("text").isNotNull).count())
    val approx = textRow.getAs[Long]("approx_distinct")
    assert(math.abs(approx - exactDistinctText).toDouble /
      exactDistinctText < 0.10, s"approx=$approx exact=$exactDistinctText")

    val nChars = p("n_chars")
    val exactMean = docs.select(round(avg(col("n_chars")), 4))
      .collect().head.getDouble(0)
    assert(nChars.getAs[Double]("mean") === exactMean)
    assert(nChars.getAs[String]("min_value").toLong <=
      nChars.getAs[String]("max_value").toLong)
    assert(p("text").getAs[Any]("mean") == null) // non-numeric → null mean
  }
}
