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
}
