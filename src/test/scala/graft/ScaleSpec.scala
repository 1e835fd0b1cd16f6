package graft

import graft.operators.{Bucketing, Salt}
import org.apache.spark.sql.functions._

/** Skew-salting and bucketing: result parity plus plan assertions. */
class ScaleSpec extends SparkSpec {

  test("salted join equals plain join, spreads hot keys across sub-keys") {
    val orders = Demo.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Demo.table(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")

    val plain = orders.join(customer, "o_custkey")
    val salted = Salt.join(orders, customer, "o_custkey", buckets = 8)

    assert(salted.count() === plain.count())
    val a = plain.orderBy("o_orderkey").collect().map(_.toSeq)
    val b = salted.select(plain.columns.map(col): _*)
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    // Drop stale table dirs from previous test JVMs: the in-memory
    // metastore forgets the table but the warehouse directory survives,
    // and saveAsTable refuses an existing unmanaged location.
    for (t <- Seq("orders_b", "customer_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
          .getPath, t)
      if (dir.exists())
        scala.reflect.io.Directory(
          new scala.reflect.io.File(dir).jfile).deleteRecursively()
    }
    Bucketing.writeBucketed(
      Demo.table(spark, sf(), "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", numBuckets = 4, bucketCols = Seq("o_custkey"))
    Bucketing.writeBucketed(
      Demo.table(spark, sf(), "customer")
        .select("c_custkey", "c_mktsegment"),
      "customer_b", numBuckets = 4, bucketCols = Seq("c_custkey"))

    val joined = spark.table("orders_b").join(spark.table("customer_b"),
      col("o_custkey") === col("c_custkey"))
    // Pre-AQE physical plan: bucketed scan on both sides -> SortMergeJoin
    // with zero ShuffleExchange (the whole point of bucketing).
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

    // and the same join un-bucketed DOES need an exchange or broadcast
    val unbucketed = Demo.table(spark, sf(), "orders")
      .join(Demo.table(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
    val p2 = unbucketed.queryExecution.sparkPlan.toString
    assert(p2.contains("Exchange") || p2.contains("Broadcast"))

    // results match the plain join
    assert(joined.count() === unbucketed.count())
  }
}
