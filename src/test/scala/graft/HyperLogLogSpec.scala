package graft

import graft.functions.{GraftFunctions, HllSketch}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HyperLogLog: register construction vs a driver
  * reference, partitioning invariance, estimate accuracy, the
  * linear-counting branch, and the SQL registration. */
class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private def driverRegs(items: Seq[String], p: Int): Seq[Int] = {
    val sk = new HllSketch(p)
    items.foreach(s => sk.offer(UTF8String.fromString(s)))
    sk.regs.map(_.toInt).toSeq
  }

  test("registers match the driver sketch; partitioning never changes a register") {
    val items = (1 to 500).map(i => s"item-$i")
    val df = items.toDF("x")
    def engine(parts: Int): Seq[Int] =
      df.repartition(parts)
        .agg(GraftFunctions.hll_registers(col("x"), 10).as("r"))
        .head().getSeq[Int](0).toSeq
    val expected = driverRegs(items, 10)
    assert(engine(1) === expected)
    assert(engine(7) === expected, "register-wise max must be partition-invariant")
    // duplicates never move a register (idempotent offers)
    val dup = (items ++ items ++ items).toDF("x")
      .agg(GraftFunctions.hll_registers(col("x"), 10).as("r"))
      .head().getSeq[Int](0).toSeq
    assert(dup === expected)
  }

  test("estimate: small cardinalities land in the linear-counting branch and stay within ~3%") {
    val n = 150
    val df = (1 to n).map(i => s"user-$i").toDF("x")
    val est = df.agg(GraftFunctions.approx_distinct(col("x"), 10).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - n) / n < 0.05, s"est $est for n=$n")
    // a 3-distinct toy: m·ln(m/V) with V = 1024 − (occupied registers)
    val toy = Seq("a", "b", "c", "a").toDF("x")
    val toyRegs = driverRegs(Seq("a", "b", "c"), 10)
    val v = toyRegs.count(_ == 0)
    val byHand = BigDecimal(1024.0 * math.log(1024.0 / v))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toyEst = toy.agg(GraftFunctions.approx_distinct(col("x"), 10).as("e"))
      .head().getDouble(0)
    assert(toyEst === byHand)
  }

  test("estimate tracks exact within the published error envelope on testdata users") {
    val ev = Demo.table(spark, sf(), "events")
    val rows = ev.groupBy("event_type")
      .agg(GraftFunctions.hll_registers(col("user_id").cast("string"), 10)
        .as("regs"), countDistinct(col("user_id")).as("n"))
      .select(GraftFunctions.hll_estimate(col("regs"), 10).as("est"), col("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, n) = (r.getDouble(0), r.getLong(1))
      // 1.04/√1024 ≈ 3.3% standard error; allow 4σ plus small-n slack
      assert(math.abs(est - n) / math.max(n, 1L) < 0.15,
        s"est $est vs exact $n")
    }
  }

  test("nulls are skipped; SQL registration serves the same registers") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("x")
    val withNulls = df.agg(GraftFunctions.hll_registers(col("x"), 8).as("r"))
      .head().getSeq[Int](0).toSeq
    assert(withNulls === driverRegs(Seq("a", "b"), 8))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("hll_null_t")
    val viaSql = spark.sql(
      "SELECT hll_registers(x, 8) FROM hll_null_t")
      .head().getSeq[Int](0).toSeq
    assert(viaSql === withNulls)
  }

  test("streaming partials: epoch merge equals the one-shot sketch; replay never moves a count") {
    val items = (1 to 300).map(i => (i.toLong, "g", s"item-${i % 120}"))
    val df = items.toDF("id", "grp", "item")
    val dir = java.nio.file.Files
      .createTempDirectory("hll-inc").toString + "/p"
    def commit(b: Long): Unit =
      graft.streaming.StreamingApproxDistinct.processBatch(
        df.filter(col("id") % 3 === b), b, "grp", "item", 10, dir)
    (0L until 3L).foreach(commit)
    val merged = graft.streaming.StreamingApproxDistinct
      .mergedRegisters(spark, dir)
      .head().getSeq[Int](1).toSeq
    val oneShot = df
      .agg(GraftFunctions.hll_registers(col("item"), 10).as("r"))
      .head().getSeq[Int](0).toSeq
    assert(merged === oneShot)
    // a replayed epoch rewrites identical registers over itself
    commit(1L)
    val replayed = graft.streaming.StreamingApproxDistinct
      .mergedRegisters(spark, dir)
      .head().getSeq[Int](1).toSeq
    assert(replayed === oneShot)
  }

  test("p outside [4,12] or non-string input fails analysis loudly") {
    val df = Seq("a").toDF("x")
    intercept[Exception] {
      df.agg(GraftFunctions.hll_registers(col("x"), 13)).collect()
    }
    intercept[Exception] {
      df.select(col("x").cast("int").as("i"))
        .agg(GraftFunctions.hll_registers(col("i"), 10)).collect()
    }
  }
}
