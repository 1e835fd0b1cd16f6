package graft

import graft.dedup.TextDedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Demo.table(spark, sf(), "documents")

  test("exactGroups: identical texts collapse to one keeper") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val g = TextDedup.exactGroups(df, "text", "doc_id")
      .orderBy("keeper_id").collect()
    assert(g.length == 2)
    assert(g(0).getAs[Long]("n_copies") == 2 && g(0).getAs[Long]("keeper_id") == 1L)
  }

  test("ngram pairs: near-identical docs found, dissimilar not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with other words entirely"))
      .toDF("doc_id", "text")
    val p = TextDedup.ngramJaccardPairs(df, "text", "doc_id", threshold = 0.5)
      .collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("minhash LSH recall equals exact jaccard pairs on testdata") {
    val exact = TextDedup.ngramJaccardPairs(docs, "text", "doc_id")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashLshPairs(docs, "text", "doc_id")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH missed ${exact.diff(lsh)} found extra ${lsh.diff(exact)}")
  }

  test("connected components: chain, clique, isolated node") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3, clique 4-5-6 (all pairs), isolated 7
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val labels = graft.dedup.ConnectedComponents
      .label(nodes, edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
  }

  test("hashed-shingle kernel equals the expression chain") {
    import org.apache.spark.sql.functions._
    val viaKernel = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.hashed_shingles(col("text"), 3).as("hs"))
    val viaExprs = docs.select(col("doc_id"),
      array_distinct(transform(TextDedup.shingles(col("text"), 3),
        s => TextDedup.strHash(s))).as("hs"))
    val k = viaKernel.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq)
    val e = viaExprs.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq)
    assert(k.toSeq === e.toSeq) // same values, same order
  }

  test("simhash: identical text → identical fingerprint; hamming 0 pairs found") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi")).toDF("doc_id", "text")
    val sh = TextDedup.simhash(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L) && sh(1L) != sh(3L))
    val pairs = TextDedup.simhashPairs(df, "text", "doc_id", maxDist = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }
}
