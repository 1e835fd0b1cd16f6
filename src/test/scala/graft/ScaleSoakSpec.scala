package graft

import org.apache.spark.sql.functions._

/** The soak harness's replica construction must preserve workload
  * density: within-replica duplicate structure identical, cross-replica
  * similarity collapsed. Otherwise the 10× run measures a different
  * workload, not scaling (SOAK_r05.md). The replica id stride is
  * max(id)+1 (round-6 ADVICE: a fixed stride silently collided replicas
  * with originals once source ids reached it). */
class ScaleSoakSpec extends SparkSpec {

  test("document replicas: within-replica dups preserved, cross-replica shingles disjoint") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, base), (2L, base), // exact dup pair
      (3L, base.replace("juliet", "kilo")) // near dup of 1
    ).toDF("doc_id", "text")
    val stride = 4L // max(doc_id) + 1
    val rep = ScaleSoak.replicateDocs(docs, 3).persist()
    assert(rep.count() === 9)
    // exact dups stay exact WITHIN each replica, and replicas never
    // collide: one digest group of size 2 per replica, never more
    val groups = rep.groupBy(md5(col("text"))).count()
      .collect().map(_.getLong(1)).sorted
    assert(groups.toSeq === Seq(1L, 1L, 1L, 2L, 2L, 2L))
    // cross-replica shingle overlap is zero (every token suffixed)
    val sh = rep.select(col("doc_id"),
      graft.functions.GraftFunctions.hashed_shingles(col("text"), 3).as("hs"))
    val cross = sh.as("a").join(sh.as("b"),
        col("a.doc_id") % stride === col("b.doc_id") % stride &&
          col("a.doc_id") < col("b.doc_id") &&
          (col("a.doc_id") / stride) =!= (col("b.doc_id") / stride))
      .select(size(array_intersect(col("a.hs"), col("b.hs"))).as("c"))
      .agg(max(col("c"))).head().getInt(0)
    assert(cross === 0)
    rep.unpersist()
  }

  test("embedding replicas: orthogonal flips preserve within-replica cosine exactly") {
    import spark.implicits._
    val v1 = Array.tabulate(16)(i => (math.sin(i + 1) * 0.7).toFloat)
    val v2 = Array.tabulate(16)(i => (math.cos(i * 0.5) * 0.7).toFloat)
    val embs = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val stride = 3L // max(vec_id) + 1
    val rep = ScaleSoak.replicateEmbeddings(embs, 2).persist()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val m = rep.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // flips are ±1 per component: |components| unchanged, so norms and
    // within-replica cosine are preserved EXACTLY (same products)
    assert(math.abs(cos(m(stride + 1L), m(stride + 2L)) - cos(v1, v2)) < 1e-12)
    // cross-replica: the same vector decorrelates from its flipped copy
    assert(math.abs(cos(m(1L), m(stride + 1L))) < 0.6)
    assert(m(stride + 1L).zip(v1).forall { case (a, b) =>
      math.abs(a) == math.abs(b) })
    rep.unpersist()
  }

  test("replica ids never collide even when source ids exceed 1e6") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2500000L, "d e f")).toDF("doc_id", "text")
    val rep = ScaleSoak.replicateDocs(docs, 2)
    assert(rep.select("doc_id").distinct().count() === 4)
    val embs = Seq((1L, Array(1f, 2f)), (2500000L, Array(3f, 4f)))
      .toDF("vec_id", "embedding")
    assert(ScaleSoak.replicateEmbeddings(embs, 2)
      .select("vec_id").distinct().count() === 4)
  }
}
