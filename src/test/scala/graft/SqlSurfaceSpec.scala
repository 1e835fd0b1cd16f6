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
    val w = spark.sql("SELECT wordpiece_tokens('Customer window') AS p")
      .collect().head.getSeq[String](0)
    assert(w === Seq("cust", "##omer", "win", "##dow"))
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

  test("GraftExtensions installs functions and the as-of strategy") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists
    // getOrCreate returns the active session (ignoring new configs), so
    // clear it to force a genuinely new session on the same SparkContext.
    // The `spark.sql.extensions=graft.GraftExtensions` string form is a
    // static conf read at SparkContext creation — not settable on a
    // shared test context — so inject through the equivalent
    // withExtensions builder hook (the same SparkSessionExtensions path).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]").appName("graft-ext-test")
        .withExtensions(e => new GraftExtensions()(e))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        "SELECT abn_valid('51824753556') AS v, " +
          "heavy_hitters(x, 4) AS hh FROM VALUES ('a'), ('a'), ('b') t(x) " +
          "GROUP BY 1").collect().head
      assert(r.getBoolean(0))
      assert(r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
        == Seq("a", "b"))
      // planner strategy arrives without any graft API call
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.AsofJoinStrategy))
    } finally {
      // do NOT stop s2 — it shares the JVM-wide SparkContext
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
