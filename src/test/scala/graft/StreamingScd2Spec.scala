package graft

import graft.operators.Scd2
import graft.streaming.StreamingScd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming SCD2: stream-folded history ≡ the batch merge fold,
  * pointer-guarded replay idempotence, and crash-window reads. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("k")
  private val A = Seq("seg")

  private def snap(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "seg")

  private def rows(h: DataFrame): Set[(Long, String, Long, Option[Long])] =
    h.select("k", "seg", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  private val epochs = Seq(
    snap(1L -> "a", 2L -> "b"),              // 0
    snap(1L -> "A", 3L -> "c"),              // 1: change, delete, insert
    snap(1L -> "A", 2L -> "b2", 3L -> "c"))  // 2: reappear changed

  private def batchFold: DataFrame =
    epochs.zipWithIndex.drop(1).foldLeft(
      Scd2.init(epochs.head, K, A, 0L)) { case (acc, (sn, e)) =>
        Scd2.merge(acc, sn, K, A, e.toLong)
      }

  test("stream-folded history equals the batch merge fold") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sscd2").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingScd2.start(input.toDF().toDF("k", "seg"), K, A,
      s"$dir/hist", s"$dir/ck")
    try {
      epochs.foreach { sn =>
        input.addData(sn.collect().map(r =>
          (r.getLong(0), r.getString(1))).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(rows(StreamingScd2.history(spark, s"$dir/hist")) ==
      rows(batchFold))
    // the open set the pointer names is exactly the live snapshot
    val Some((epoch, openPath)) = StreamingScd2.current(spark, s"$dir/hist")
    assert(epoch == 2L)
    assert(spark.read.parquet(openPath).count() == 3)
  }

  test("replayed epochs are no-ops; crash-window orphan partitions are excluded then healed") {
    val dir = java.nio.file.Files.createTempDirectory("sscd2c").toString + "/h"
    StreamingScd2.processBatch(epochs(0), 0L, K, A, dir)
    StreamingScd2.processBatch(epochs(1), 1L, K, A, dir)
    val afterTwo = rows(StreamingScd2.history(spark, dir))
    // replay an already-committed epoch: pointer guard, nothing changes
    StreamingScd2.processBatch(epochs(1), 1L, K, A, dir)
    StreamingScd2.processBatch(epochs(0), 0L, K, A, dir)
    assert(rows(StreamingScd2.history(spark, dir)) == afterTwo)
    // crash window: epoch 2's CLOSED partition lands but the pointer
    // never swaps — history must NOT see the orphan rows
    import org.apache.spark.sql.functions._
    Scd2.merge(spark.read.parquet(s"$dir/open-1"), epochs(2), K, A, 2L)
      .filter(col("valid_to").isNotNull)
      .withColumn("batch_id", lit(2L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/closed")
    assert(rows(StreamingScd2.history(spark, dir)) == afterTwo)
    // the replay of epoch 2 completes the fold deterministically
    StreamingScd2.processBatch(epochs(2), 2L, K, A, dir)
    assert(rows(StreamingScd2.history(spark, dir)) == rows(batchFold))
  }

  test("per-epoch work reads only the open set, never closed history") {
    val dir = java.nio.file.Files.createTempDirectory("sscd2o").toString + "/h"
    StreamingScd2.processBatch(epochs(0), 0L, K, A, dir)
    StreamingScd2.processBatch(epochs(1), 1L, K, A, dir)
    // open set shrinks to live keys while closed rows accumulate
    val Some((_, openPath)) = StreamingScd2.current(spark, dir)
    assert(spark.read.parquet(openPath).count() == 2)          // 1->A, 3->c
    assert(spark.read.parquet(s"$dir/closed").count() == 2)    // 1->a, 2->b
  }
}
