package graft

import graft.functions.GraftFunctions

/** The custom expressions through the SQL surface (S10): registered
  * functions usable from spark.sql over temp views. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered functions work from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT abn_valid('51824753556') AS v, abn_valid('51824753557') AS i, " +
        "token_sort_ratio('acme corp', 'corp acme') AS t").collect().head
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(r.getDouble(2) === 1.0)
  }

  test("SQL over temp views matches the DSL query") {
    Demo.table(spark, sf(), "orders").createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT o_custkey, count(*) AS n FROM orders_v
        |GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import org.apache.spark.sql.functions._
    val dsl = Demo.table(spark, sf(), "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("o_custkey")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sql.toSeq === dsl.toSeq)
  }
}
