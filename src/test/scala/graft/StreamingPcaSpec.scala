package graft

import graft.embeddings.Pca
import graft.streaming.StreamingPca
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingPcaSpec extends SparkSpec {

  import spark.implicits._

  private val D = 4
  private def vec(a: Double, b: Double, c: Double, e: Double) =
    Seq(a, b, c, e)

  private val allRows = Seq(
    (1L, vec(1.0, 0.2, 0.0, 0.1)), (2L, vec(0.9, 0.1, 0.1, 0.0)),
    (3L, vec(-1.0, 0.3, 0.2, 0.0)), (4L, vec(0.5, -0.8, 0.1, 0.2)),
    (5L, vec(0.4, 0.9, -0.2, 0.1)), (6L, vec(-0.3, 0.7, 0.3, -0.1)),
    (7L, vec(0.1, 0.1, 1.0, 0.4)), (8L, vec(0.0, -0.2, -0.9, 0.3)))

  test("streamed statistics fit bit-identically to a batch fit over everything accepted") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spca").toString
    val (outDir, statsDir, ckDir) = (s"$dir/out", s"$dir/stats", s"$dir/ck")
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamingPca.start(input.toDF().toDF("vec_id", "embedding"),
      "embedding", "vec_id", D, outDir, statsDir, ckDir)
    try {
      input.addData(allRows.take(3): _*)
      q.processAllAvailable()
      input.addData(allRows.slice(3, 5): _*)
      q.processAllAvailable()
      input.addData(allRows.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    // corpus holds every streamed vector exactly once
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq === (1L to 8L))
    val streamed = StreamingPca.fitFromDir(spark, statsDir, k = 2, iters = 32)
    val batch = Pca.fit(allRows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", k = 2, iters = 32)
    assert(streamed.n === batch.n)
    assert(streamed.meanU.toSeq === batch.meanU.toSeq)
    assert(streamed.comps.flatten.toSeq === batch.comps.flatten.toSeq)
    assert(streamed.lambdas.toSeq === batch.lambdas.toSeq)
  }

  test("half-commit replay rewrites identical statistics — totals never double-count") {
    val dir = java.nio.file.Files.createTempDirectory("spca-half").toString
    val (outDir, statsDir) = (s"$dir/out", s"$dir/stats")
    val b0 = allRows.take(4).toDF("vec_id", "embedding")
    val b1 = allRows.drop(4).toDF("vec_id", "embedding")
    StreamingPca.processBatch(b0, 0L, "embedding", "vec_id", D, outDir, statsDir)
    StreamingPca.processBatch(b1, 1L, "embedding", "vec_id", D, outDir, statsDir)
    val before = StreamingPca.fitFromDir(spark, statsDir, k = 2, iters = 32)
    // crash window: batch 1's stats partition is lost, corpus survived
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    deleteRec(java.nio.file.Paths.get(s"$statsDir/batch_id=1"))
    StreamingPca.processBatch(b1, 1L, "embedding", "vec_id", D, outDir, statsDir)
    val replayed = StreamingPca.fitFromDir(spark, statsDir, k = 2, iters = 32)
    assert(replayed.n === before.n)
    assert(replayed.comps.flatten.toSeq === before.comps.flatten.toSeq)
    assert(replayed.lambdas.toSeq === before.lambdas.toSeq)
    // full replay of an already-committed batch: overwrite, not append
    StreamingPca.processBatch(b0, 0L, "embedding", "vec_id", D, outDir, statsDir)
    val again = StreamingPca.fitFromDir(spark, statsDir, k = 2, iters = 32)
    assert(again.n === before.n)
    assert(again.comps.flatten.toSeq === before.comps.flatten.toSeq)
    assert(spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq === (1L to 8L))
  }
}
