package graft

import graft.dedup.{DedupEval, TextDedup}
import org.apache.spark.sql.functions._

/** Dedup evaluation mart: hand-checked planted variants and truth pairs,
  * metric semantics on a controlled corpus, and pairs-vs-edges
  * agreement of the production families ON the planted eval corpus. */
class DedupEvalSpec extends SparkSpec {

  private val ten =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  test("planted corpus: hand-checked variants, ids, and truth pairs") {
    val s = spark
    import s.implicits._
    // origin 0: divisible by 2 and 3 -> all four variants
    // origin 1 (one token): no v1 (needs >= 2 tokens), no v2 (k=0), no v3
    // origins 2/3 from an exact-dup pair: ONE origin (min id 2), v1+v2
    val docs = Seq(
      (0L, ten), (1L, "solo"), (2L, ten + " extra"), (3L, ten + " extra"))
      .toDF("doc_id", "text")
    val p = DedupEval.plantedCorpus(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // origin 0: v0..v3; 10 tokens -> v1 drops "juliet", v2 keeps 8
    assert(p(0L) === ((0L, ten)))
    assert(p(1L) === ((0L,
      "alpha bravo charlie delta echo foxtrot golf hotel india")))
    assert(p(2L) === ((0L,
      "alpha bravo charlie delta echo foxtrot golf hotel")))
    assert(p(3L) === ((0L, ten)))
    // origin 1: single token -> only the original survives
    assert(p(4L) === ((1L, "solo")))
    assert(!p.contains(5L) && !p.contains(6L) && !p.contains(7L))
    // exact-dup originals collapse to origin 2 (min doc_id); 11 tokens
    // -> v1 (10 tokens) and v2 (k=8) exist, no v3 (2 % 3 != 0)
    assert(p(8L)._2 === ten + " extra")
    assert(p(9L) === ((2L, ten)))
    assert(p(10L)._2 ===
      "alpha bravo charlie delta echo foxtrot golf hotel")
    assert(!p.contains(11L) && !p.contains(12L))
    assert(p.size === 8)
    // truth pairs: C(4,2)=6 for origin 0, 0 for origin 1, C(3,2)=3 for 2
    assert(DedupEval.truthPairs(
      DedupEval.plantedCorpus(docs, "text", "doc_id")).count() === 9L)
  }

  test("eval report semantics: exact finds only byte-identical pairs; looser thresholds dominate recall") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, ten), (6L, ten.replace("alpha", "zeta")),
      (12L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val rep = DedupEval.evalReport(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.size === DedupEval.Families.size)
    // every origin here is divisible by 2 and 3: per origin the pairs
    // are (v0,v1),(v0,v2),(v0,v3),(v1,v2),(v1,v3),(v2,v3) -> 18 truth
    rep.values.foreach(r => assert(r.getLong(1) === 18L, s"$r"))
    // exact detects exactly the (v0,v3) byte-identical copy per origin:
    // precision 1, recall 3/18
    val ex = rep("exact")
    assert(ex.getLong(3) === 3L && ex.getLong(4) === 0L, s"$ex")
    assert(ex.getDouble(6) === 1.0 && ex.getDouble(7) === 0.1667, s"$ex")
    // a looser Jaccard cut can only add detected pairs: recall at 0.6
    // dominates 0.8, and both dominate exact
    val r06 = rep("ngram_jaccard_0.6").getDouble(7)
    val r08 = rep("ngram_jaccard_0.8").getDouble(7)
    assert(r06 >= r08 && r08 >= ex.getDouble(7), s"r06=$r06 r08=$r08")
    // the truncation variant (~0.75 Jaccard vs v0) is exactly what
    // separates the two threshold rows on this corpus
    assert(r06 > r08, s"0.6 must catch the truncation variant: $r06 $r08")
    // fp + tp = n_pred and fn = n_truth - tp on every row
    rep.values.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) === r.getLong(2), s"$r")
      assert(r.getLong(5) === r.getLong(1) - r.getLong(3), s"$r")
    }
  }

  test("pairs-vs-edges agreement on the planted eval corpus") {
    val docs = Demo.table(spark, sf(), "documents")
    val planted = DedupEval.plantedCorpus(docs, "text", "doc_id")
    val nodes = planted.select(col("doc_id"))
    def comp(edges: org.apache.spark.sql.DataFrame) =
      graft.dedup.ConnectedComponents.label(nodes, edges, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the star+bridge edge frames must induce the same duplicate
    // clusters as the quadratic pair frames on the eval corpus — the
    // agreement half of the mart (the report's counts are pair-grain;
    // production dedup runs edge-grain)
    val viaPairs = comp(TextDedup.minhashLshPairs(planted, "text", "doc_id")
      .select("doc_a", "doc_b"))
    val viaEdges = comp(TextDedup.minhashLshEdges(planted, "text", "doc_id"))
    assert(viaPairs === viaEdges)
    val sh = TextDedup.simhash(planted, "text", "doc_id")
    val viaSimPairs = comp(
      TextDedup.simhashPairsWide(planted, "text", "doc_id", maxDist = 1)
        .select("doc_a", "doc_b"))
    val viaSimEdges = comp(TextDedup.hammingEdgesWide(sh, "doc_id",
      "simhash", maxDist = 1, chunkBits = 15))
    assert(viaSimPairs === viaSimEdges)
  }

  test("decontamination eval mart: copy anchor at 1.0, recall monotone in threshold and drift, wrong-bench honest") {
    val s = spark
    import s.implicits._
    val emb = Demo.table(spark, sf(), "embeddings")
    val nl = graft.embeddings.SemanticDedup.nlistForCount(emb.count())
    val cents = graft.embeddings.EmbeddingOps.ivfCentroids(emb,
      "embedding", "vec_id", nl)
    val rep = graft.dedup.DecontaminationEval.evalReport(emb,
      "embedding", "vec_id", cents)
      .collect()
      .map(r => ((r.getString(0), r.getDouble(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(rep.size === 12)
    // the verbatim-copy anchor: cosine 1.0 to its bench, caught at
    // every threshold
    graft.dedup.DecontaminationEval.Thresholds.foreach { t =>
      val (nt, nd, rc, _) = rep(("copy", t))
      assert(nt > 0 && nd === nt && rc === 1.0, s"copy@$t: $nd/$nt")
    }
    // recall is monotone non-increasing in threshold within a level...
    graft.dedup.DecontaminationEval.Levels.foreach { case (lvl, _, _) =>
      val rs = graft.dedup.DecontaminationEval.Thresholds.sorted
        .map(t => rep((lvl, t))._3)
      assert(rs === rs.sorted.reverse, s"$lvl recall not monotone: $rs")
    }
    // ...and non-increasing in drift at a fixed threshold
    graft.dedup.DecontaminationEval.Thresholds.foreach { t =>
      val rs = graft.dedup.DecontaminationEval.Levels
        .map { case (lvl, _, _) => rep((lvl, t))._3 }
      assert(rs === rs.sorted.reverse, s"thr $t recall not monotone: $rs")
    }
  }
}
