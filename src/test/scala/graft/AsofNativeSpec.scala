package graft

import graft.plans.{AsofJoin, AsofJoinExec}
import graft.operators.Relational
import org.apache.spark.sql.functions._

class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private def purchases = Demo.table(spark, sf(), "events")
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts", "value")
  private def clicks = Demo.table(spark, sf(), "events")
    .filter(col("event_type") === "click")
    .select(col("user_id"), col("ts").as("click_ts"),
      col("value").as("click_value"))

  test("native as-of join equals the union+window formulation on testdata") {
    val native = AsofJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts")
      .orderBy("event_id").collect()
    val viaWindow = Relational.asofJoin(purchases, clicks,
      Seq("user_id"), "ts", "click_ts").orderBy("event_id").collect()
    assert(native.length == viaWindow.length)
    assert(native.map(_.toString).toSeq == viaWindow.map(_.toString).toSeq)
  }

  test("physical plan is AsofJoinExec with one shuffle per side") {
    val df = AsofJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts")
    df.collect() // materialize so AQE finalizes the plan
    // AQE wraps finished stages in leaf QueryStageExec nodes; flatten
    // through them to see the whole physical tree
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[AsofJoinExec]),
      s"no AsofJoinExec in:\n${df.queryExecution.executedPlan}")
    val shuffles = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles == 2, s"expected 2 shuffles, got $shuffles")
  }

  test("unmatched left rows null-pad; allowExact toggles boundary rows") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "lv")
    val r = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "r1"))
      .toDF("k", "rts", "rv")
    val exact = AsofJoin(l, r, Seq("k"), "ts", "rts").orderBy("ts", "k")
      .collect().map(x => (x.getLong(0), x.getString(2), x.get(3), x.get(4)))
      .toSeq
    // both the primitive rts and the string rv must null-pad on no-match
    assert(exact == Seq(
      (2L, "c", null, null), (1L, "a", 10L, "r10"), (1L, "b", 15L, "r15")))
    val strict = AsofJoin(l, r, Seq("k"), "ts", "rts", allowExact = false)
      .orderBy("ts", "k")
      .collect().map(x => (x.getLong(0), x.getString(2), x.get(4))).toSeq
    assert(strict == Seq(
      (2L, "c", null), (1L, "a", null), (1L, "b", "r15")))
  }

  test("self-join sides with shared lineage do not collide") {
    val base = Seq((1L, 10L, 1.0), (1L, 20L, 2.0)).toDF("k", "ts", "v")
    val out = AsofJoin(base,
      base.select(col("k"), col("ts").as("rts"), col("v").as("rv")),
      Seq("k"), "ts", "rts")
    assert(out.columns.toSeq == Seq("k", "ts", "v", "rts", "rv"))
    assert(out.count() == 2)
  }

  test("property: native equals union+window on seeded random data") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 5) {
      val l = (1 to 200).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
        .toDF("k", "ts", "lid")
      // right ts unique per key (documented determinism precondition)
      val r = rnd.shuffle((0 until 8).flatMap(k =>
        rnd.shuffle((0 until 1000).toList).take(50).map(t =>
          (k.toLong, t.toLong, s"p$k-$t"))))
        .toDF("k", "rts", "payload")
      val native = AsofJoin(l, r, Seq("k"), "ts", "rts")
        .orderBy("lid").collect().map(_.toString).toSeq
      val window = Relational.asofJoin(l,
        r.select(col("k"), col("rts"), col("payload")),
        Seq("k"), "ts", "rts").orderBy("lid")
        .select("k", "ts", "lid", "rts", "payload")
        .collect().map(_.toString).toSeq
      assert(native == window, s"round $round diverged")
    }
  }

  test("forward direction: earliest right at-or-after; negation duality") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"))
      .toDF("k", "ts", "lv")
    val r = Seq((1L, 12L, "r12"), (1L, 25L, "r25")).toDF("k", "rts", "rv")
    val fwd = AsofJoin(l, r, Seq("k"), "ts", "rts", forward = true)
      .orderBy("ts").collect().map(x => (x.getString(2), x.get(4))).toSeq
    assert(fwd == Seq(("a", "r12"), ("b", "r25"), ("c", null)))
    // duality: forward(ts) == backward(-ts) on seeded random data
    val rnd = new scala.util.Random(23)
    val lr = (1 to 150).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val rr = (0 until 5).flatMap(k =>
      rnd.shuffle((0 until 500).toList).take(40).map(t =>
        (k.toLong, t.toLong, s"p$k-$t"))).toDF("k", "rts", "payload")
    val forward = AsofJoin(lr, rr, Seq("k"), "ts", "rts", forward = true)
      .orderBy("lid")
      .select("lid", "payload").collect().map(_.toString).toSeq
    val negBackward = AsofJoin(
      lr.withColumn("ts", -col("ts")), rr.withColumn("rts", -col("rts")),
      Seq("k"), "ts", "rts")
      .orderBy("lid")
      .select("lid", "payload").collect().map(_.toString).toSeq
    assert(forward == negBackward)
  }

  test("pruning rule narrows child scans to referenced columns") {
    val df = AsofJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts")
      .select("event_id", "click_value")
    df.collect()
    // (AQE prints the initial and final plan, so each scan appears twice)
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema"))
      .map(_.dropWhile(_ != '+')).toSeq.distinct
    assert(scans.size == 2, s"expected 2 scans:\n${scans.mkString("\n")}")
    // purchases side: event_id,user_id,ts survive; its `value` payload is
    // unreferenced and must be pruned from the parquet read
    val leftScan = scans.find(_.contains("event_id")).get
    assert(!leftScan.contains("value"), s"left scan not pruned: $leftScan")
    assert(df.collect().length > 0)
  }
}
