package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Video-column dedup: frame-digest-set Jaccard through the shared
  * inverted-index core — planted full dups, prefix extensions
  * (re-encode-with-appended-tail), and threshold behavior. */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic payload of exactly `len` bytes. */
  private def payload(seed: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((i * 31 + seed * 97) % 251).toByte)

  private def frame = 64
  // frames sampled every 4th: a 512-byte payload covers sampled frame
  // indices 0 and 4; appending 512 more adds sampled indices 8 and 12

  test("identical payloads pair at jaccard 1.0; unrelated do not pair") {
    val a = payload(1, 512)
    val rows = Seq((1L, a), (2L, a.clone()), (3L, payload(9, 512)))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.videoDedupPairs(rows, "payload", "doc_id")
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") === 1.0)
  }

  test("prefix-extended copy: shared sampled frames give exact fractional jaccard") {
    val a = payload(3, 512)                      // sampled frames {0, 4}
    val b = a ++ payload(55, 512)                // sampled {0, 4, 8, 12}
    val rows = Seq((1L, a), (2L, b)).toDF("doc_id", "payload")
    // |∩| = 2, |∪| = 4 → jaccard 0.5: found at threshold 0.5…
    val found = Multimodal.videoDedupPairs(rows, "payload", "doc_id",
      threshold = 0.5).collect()
    assert(found.length === 1)
    assert(found.head.getAs[Double]("jaccard") === 0.5)
    // …and correctly absent at the 0.8 default
    assert(Multimodal.videoDedupPairs(rows, "payload", "doc_id")
      .collect().isEmpty)
  }

  test("within-payload repeated frames dedup to a set (no double counting)") {
    val block = payload(7, 256)
    val a = block ++ block ++ block ++ block     // 1024 bytes of repeats
    // sampled frames 0, 4, 8, 12 → byte ranges repeat with period 256,
    // so digests collapse to ONE distinct frame; an unrelated payload
    // with the same repeated structure still must not pair
    val rows = Seq((1L, a), (2L, a.clone()), (3L, {
      val o = payload(8, 256); o ++ o ++ o ++ o
    })).toDF("doc_id", "payload")
    val pairs = Multimodal.videoDedupPairs(rows, "payload", "doc_id")
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("testdata: exact text duplicates appear as video pairs at jaccard 1.0") {
    val docs = Demo.table(spark, sf(), "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val pairs = Multimodal.videoDedupPairs(docs, "payload", "doc_id")
      .collect()
    val exactDups = graft.dedup.TextDedup.exactGroups(
      Demo.table(spark, sf(), "documents"), "text", "doc_id")
      .filter(col("n_copies") > 1).count()
    // every exact-duplicate text group yields at least one frame-set pair
    assert(exactDups === 0 || pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.8))
  }
}
