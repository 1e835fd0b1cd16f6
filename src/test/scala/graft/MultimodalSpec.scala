package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: metadata, frame sampling, stub
  * decode via typed mapPartitions. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet(sf() + "/documents.parquet")
    .withColumn("payload", encode(col("text"), "UTF-8"))

  test("metadata: byte_len, md5, magic over binary payloads") {
    val m = docs.select(col("doc_id"), col("text"),
      Multimodal.metadata(col("payload")).as("meta")).limit(5).collect()
    m.foreach { r =>
      val text = r.getAs[String]("text")
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[Long]("byte_len") === text.getBytes("UTF-8").length)
      assert(meta.getAs[String]("md5").length === 32)
      assert(meta.getAs[String]("magic").length <= 8)
    }
  }

  test("frame sampling: every k-th fixed-size slice, short tail kept") {
    val one = docs.limit(1)
    val frames = Multimodal.frameRows(one, "payload", "doc_id",
      frameSize = 64, every = 4).collect()
    val textLen = one.select(length(col("payload"))).collect().head.getInt(0)
    val nFrames = (textLen + 63) / 64
    val expected = (0 until nFrames).count(_ % 4 == 0)
    assert(frames.length === expected)
    assert(frames.map(_.getAs[Int]("frame_idx")).forall(_ % 4 == 0))
  }

  test("decode stub: deterministic, partition-parallel, typed output") {
    val out = Multimodal.decodeImagesStub(
      docs.repartition(3), "payload", "doc_id")
    val rows = out.collect().sortBy(_.id)
    assert(rows.length === docs.count())
    assert(rows.forall(r => r.width >= 64 && r.height >= 64 && r.channels == 3))
    assert(rows.forall(r => r.brightness >= 0.0 && r.brightness <= 1.0))
    // determinism across runs/partitionings
    val again = Multimodal.decodeImagesStub(
      docs.repartition(7), "payload", "doc_id").collect().sortBy(_.id)
    assert(rows.toSeq === again.toSeq)
  }
}
