package graft

import graft.io.ParquetSink
import org.apache.spark.sql.functions._

class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-psink").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("partitioned write prunes partitions on filtered read") {
    val path = tmpDir()
    val events = Demo.table(spark, sf(), "events")
      .select("event_id", "event_type", "user_id", "value")
    ParquetSink.writePartitioned(events, path, Seq("event_type"))
    val clicks = spark.read.parquet(path)
      .filter(col("event_type") === "click")
    // partition pruning: the filter lands in PartitionFilters, and only
    // the click directory is scanned
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type#") , s"no partition filter in:\n$scan")
    assert(clicks.count() ==
      events.filter(col("event_type") === "click").count())
  }

  test("sort-clustered write yields range-disjoint files; point scans prune") {
    val path = tmpDir()
    val orders = Demo.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    ParquetSink.writeSortedBy(orders, path, Seq("o_orderkey"), numFiles = 8)
    // each parquet file covers a disjoint o_orderkey range — the
    // precondition for row-group min/max skipping
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size > 1, "range repartition should emit multiple files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // the content round-trips and a sort-key predicate is pushed to the scan
    val probe = spark.read.parquet(path)
      .filter(col("o_orderkey") === ranges.head._2)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_orderkey"),
      s"predicate not pushed:\n$scan")
    assert(probe.count() === 1)
    assert(spark.read.parquet(path).count() === orders.count())
  }

  test("dynamic overwrite replaces only incoming partitions") {
    val path = tmpDir()
    val v1 = Seq(("a", 1), ("a", 2), ("b", 10)).toDF("part", "v")
    ParquetSink.writePartitioned(v1, path, Seq("part"))
    // backfill partition a only; b must survive
    val v2 = Seq(("a", 99)).toDF("part", "v")
    ParquetSink.writePartitioned(v2, path, Seq("part"))
    val out = spark.read.parquet(path).orderBy("part", "v")
      .collect().map(r => (r.getAs[String]("part"), r.getAs[Int]("v"))).toSeq
    assert(out == Seq(("a", 99), ("b", 10)))
  }

  test("zValue: hand-computed Morton codes; guard rejects out-of-range") {
    import graft.operators.ZOrder
    val rows = Seq((0L, 0L), (3L, 1L), (1L, 3L), (5L, 2L),
      ((1L << 31) - 1L, 0L)).toDF("a", "b")
    val z = rows.select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,1): a bits→0,2  b bit→1  = 0b0111 = 7
    // (1,3): a bit→0     b bits→1,3 = 0b1011 = 11
    // (5,2): a=101→0,4   b=010→3   = 0b11001 = 25
    // (2^31-1, 0): all even bits set below 62
    val full = (0 until 31).map(i => 1L << (2 * i)).reduce(_ | _)
    assert(z == Seq(0L, 7L, 11L, 25L, full))
    val bad = Seq((-1L, 0L)).toDF("a", "b")
    intercept[Exception] {
      bad.select(ZOrder.zValue(col("a"), col("b"))).collect()
    }
  }

  test("zValue properties: per-axis monotone, bit-exact invertible") {
    import graft.operators.ZOrder
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(1 << 20).toLong,
      rnd.nextInt(1 << 20).toLong))
    val zs = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // invertible: de-interleaving recovers both inputs exactly
    zs.foreach { case (a, b, z) =>
      var (ra, rb) = (0L, 0L)
      (0 until 31).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"($a,$b) -> $z -> ($ra,$rb)")
    }
    // monotone per axis: fixed b, larger a → larger z (and vice versa)
    val byB = zs.groupBy(_._2).values.filter(_.length > 1)
    byB.foreach { g =>
      val sorted = g.sortBy(_._1)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
    val byA = zs.groupBy(_._1).values.filter(_.length > 1)
    byA.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
  }

  test("z-ordered layout: point predicates on EITHER key skip most files") {
    import graft.io.ParquetSink
    val path = tmpDir()
    val orders = Demo.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    ParquetSink.writeZOrdered(orders, path, "o_orderkey", "o_custkey",
      numFiles = 16)
    val table = spark.read.parquet(path)
    assert(table.count() == orders.count())
    // per-file min/max of BOTH keys: a z-sorted layout confines each
    // key's range per file far below the global range for most files
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size > 4)
    def spanFraction(key: String): Double = {
      val global = table.agg(min(col(key)), max(col(key))).collect()(0)
      val span = (global.getLong(1) - global.getLong(0)).toDouble
      val perFile = files.map { f =>
        val r = spark.read.parquet(f).agg(min(col(key)), max(col(key)))
          .collect()(0)
        (r.getLong(1) - r.getLong(0)) / span
      }
      perFile.sum / perFile.size
    }
    // mean per-file key-span fraction well under 1 on both axes — the
    // skipping precondition (a random layout would be ~1.0 per file)
    val fa = spanFraction("o_orderkey")
    val fb = spanFraction("o_custkey")
    info(s"mean per-file span fraction: o_orderkey=$fa o_custkey=$fb")
    assert(fa < 0.6, s"o_orderkey span fraction $fa")
    assert(fb < 0.6, s"o_custkey span fraction $fb")
  }

  test("deleteByKeys rewrites only affected partitions, removes emptied ones, idempotent") {
    val path = tmpDir()
    val rows = Seq(
      (1L, "en", "keep"), (2L, "en", "drop"), (3L, "en", "keep"),
      (4L, "de", "drop"), (5L, "de", "drop"),             // de fully doomed
      (6L, "fr", "keep"), (7L, "fr", "keep"))             // fr untouched
      .toDF("doc_id", "lang", "text")
    ParquetSink.writePartitioned(rows, path, Seq("lang"))
    def listing(part: String): Set[String] =
      new java.io.File(path, s"lang=$part").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val frBefore = listing("fr")
    val doomed = Seq(2L, 4L, 5L, 999L).toDF("doc_id") // 999 absent: ignored
    ParquetSink.deleteByKeys(spark, path, "lang", "doc_id", doomed)
    val after = spark.read.parquet(path).select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(after == Seq(1L, 3L, 6L, 7L))
    // the fully-emptied partition directory is gone
    assert(!new java.io.File(path, "lang=de").exists())
    // the untouched partition's files are byte-identical (same listing)
    assert(listing("fr") == frBefore)
    // re-running is a no-op (idempotent takedown)
    ParquetSink.deleteByKeys(spark, path, "lang", "doc_id", doomed)
    val again = spark.read.parquet(path).select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(again == after)
    // an all-absent key set touches nothing at all
    val enFiles = listing("en")
    ParquetSink.deleteByKeys(spark, path, "lang", "doc_id",
      Seq(888L).toDF("doc_id"))
    assert(listing("en") == enFiles && listing("fr") == frBefore)
  }
}
