package graft

import graft.text.SequencePacking
import org.apache.spark.sql.Row

/** SequencePacking: stream-packing assignment, boundary handling, and the
  * per-sequence roll-up invariants. */
class SequencePackingSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "shard", "text")
  }

  private def packed(rows: (Long, String, String)*) =
    SequencePacking.pack(docs(rows: _*), "text", "doc_id",
      budget = 10, shardCol = "shard")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap

  test("documents pack in doc_id order with exclusive prefix offsets") {
    // token counts: 4, 4, 4 → starts 0, 4, 8 → seqs 0, 0, 0
    val p = packed(
      (1L, "a", "w w w w"), (2L, "a", "w w w w"), (3L, "a", "w w w w"))
    assert(p(1L) == ((4L, 0L, 0L, false)))
    assert(p(2L) == ((4L, 0L, 4L, false)))
    // starts at offset 8 with 4 tokens: spills over the 10-token boundary
    assert(p(3L) == ((4L, 0L, 8L, true)))
  }

  test("document starting exactly on a boundary opens the next sequence") {
    // 10 + 3 tokens: doc 2 starts at offset 0 of sequence 1, no overflow
    val p = packed((1L, "a", Seq.fill(10)("w").mkString(" ")),
      (2L, "a", "w w w"))
    assert(p(1L) == ((10L, 0L, 0L, false)))
    assert(p(2L) == ((3L, 1L, 0L, false)))
  }

  test("a document ending exactly at the boundary does not span it") {
    // 6 + 4 tokens: doc 2 occupies offsets 6..9 — flush, not a spill
    val p = packed((1L, "a", "w w w w w w"), (2L, "a", "w w w w"))
    assert(p(2L) == ((4L, 0L, 6L, false)))
  }

  test("shards pack independently") {
    val p = packed((1L, "a", Seq.fill(9)("w").mkString(" ")),
      (2L, "b", "w w"), (3L, "a", "w w"))
    assert(p(2L) == ((2L, 0L, 0L, false))) // shard b unaffected by shard a
    assert(p(3L) == ((2L, 0L, 9L, true)))
  }

  test("derived shard default tracks defaultParallelism and stays deterministic") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(id => (id, "w w w w w")).toDF("doc_id", "text")
    val auto = SequencePacking.pack(df, "text", "doc_id", budget = 10)
    val parallelism = spark.sparkContext.defaultParallelism
    val shards = auto.select("shard").distinct().collect()
      .map(_.getLong(0)).toSet
    // cardinality tracks the cluster: every derived shard is one of the
    // parallelism hash cells, and 200 ids fill them all at local[4]
    assert(shards.size === parallelism)
    assert(shards.forall(v => v >= 0 && v < parallelism))
    // hash sharding is a pure function of the id: identical assignment
    // regardless of input partitioning
    val again = SequencePacking.pack(df.repartition(13), "text", "doc_id",
      budget = 10).orderBy("doc_id").collect()
    assert(auto.orderBy("doc_id").collect().sameElements(again))
    // per-shard packing invariant holds under the derived sharding too
    val stats = SequencePacking.sequenceStats(auto)
    assert(stats.count() > 0)
  }

  test("sequenceStats rolls up docs/tokens and flags overflow sequences") {
    val df = SequencePacking.pack(
      docs((1L, "a", Seq.fill(8)("w").mkString(" ")), (2L, "a", "w w w"),
        (3L, "a", "w w")),
      "text", "doc_id", budget = 10, shardCol = "shard")
    val stats = SequencePacking.sequenceStats(df)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // seq 0: docs 1 (8 toks) + 2 (starts at 8, spans) ; seq 1: doc 3
    assert(stats(("a", 0L)) == ((2L, 11L, true)))
    assert(stats(("a", 1L)) == ((1L, 2L, false)))
  }

  test("shardByTokenBudget: two-phase prefix sum equals the naive global window for any bucket count") {
    import org.apache.spark.sql.functions._
    val d = Demo.table(spark, sf(), "documents")
    val cnt = graft.text.TextAnalysis.tokenCount(col("text"))
    def run(buckets: Int) =
      SequencePacking.shardByTokenBudget(d, cnt, "doc_id", 5000L, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    val one = run(1)      // single bucket == literally the global window
    val seven = run(7)
    val auto = run(0)     // derived defaultParallelism bucket count
    assert(one == seven && one == auto)
    // start_tok is the exclusive prefix of n_tokens in doc_id order
    var acc = 0L
    one.foreach { case (_, n, start, _) =>
      assert(start == acc); acc += n
    }
    // shard = start_tok DIV budget → contiguous ids, each shard's token
    // span within one document of the budget
    val shards = one.map(_._4).distinct
    assert(shards == (0L to shards.max))
    // determinism under repartitioning
    val again = SequencePacking.shardByTokenBudget(
      d.repartition(13), cnt, "doc_id", 5000L, 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(again == one.map(t => (t._1, t._4)).toMap)
  }

  test("shardByTokenBudget: sparse/offset ids and a single-doc corpus") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // ids 1000, 5000, 5001 — sparse range; widths still partition it
    val d = Seq((1000L, "a b c"), (5000L, "d e"), (5001L, "f"))
      .toDF("doc_id", "text")
    val out = SequencePacking.shardByTokenBudget(d,
      graft.text.TextAnalysis.tokenCount(col("text")), "doc_id", 4L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // starts 0, 3, 5 → shards 0, 0, 1
    assert(out == Set((1000L, 0L, 0L), (5000L, 3L, 0L), (5001L, 5L, 1L)))
    val solo = SequencePacking.shardByTokenBudget(
      Seq((42L, "x y")).toDF("doc_id", "text"),
      graft.text.TextAnalysis.tokenCount(col("text")), "doc_id", 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(solo.toSeq == Seq((42L, 0L, 0L)))
  }

  test("shardByTokenBudget: non-numeric id raises instead of silently nulling") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val bad = Seq(("doc-a", "a b c"), ("doc-b", "d e")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      SequencePacking.shardByTokenBudget(bad,
        graft.text.TextAnalysis.tokenCount(col("text")), "doc_id", 4L, 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("numeric-castable id")),
      s"unexpected failure: $ex")
    // numeric STRING ids are fine — the cast succeeds
    val ok = SequencePacking.shardByTokenBudget(
      Seq(("7", "a b"), ("9", "c")).toDF("doc_id", "text"),
      graft.text.TextAnalysis.tokenCount(col("text")), "doc_id", 4L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ok == Set((7L, 0L), (9L, 2L)))
  }

  test("chunking: window starts, overlap, and short tails") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = graft.text.Chunking.chunk(d, "text", "doc_id",
      chunkSize = 4, overlap = 1) // step 3 → starts 0,3,6,9 for n=10
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out.keys.count(_._1 == 1L) == 4) // ceil(10/3) = 4 windows
    assert(out((1L, 0L)) == 4 && out((1L, 1L)) == 4 && out((1L, 2L)) == 4)
    assert(out((1L, 3L)) == 1) // tail window: token 10 only
    assert(out.keys.count(_._1 == 2L) == 1 && out((2L, 0L)) == 2)
    assert(!out.keys.exists(_._1 == 3L)) // empty doc → no chunks
    // overlap: window 1 starts at token 4 (w4..w7) — verify via md5
    val rows = graft.text.Chunking.chunk(d, "text", "doc_id", 4, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("w4 w5 w6 w7".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(rows((1L, 1L)) == expect)
  }

  test("packSplit: fragments tile each doc and fill every non-final sequence") {
    import org.apache.spark.sql.functions._
    // counts 4, 13, 3 in shard a → starts 0, 4, 17; budget 10.
    // doc 2 crosses boundaries at 10 — fragments (seq0: 6), (seq1: 7);
    // doc 3 sits wholly in seq 1 (offsets 7..9).
    val d = docs((1L, "a", "w w w w"),
      (2L, "a", Seq.fill(13)("w").mkString(" ")), (3L, "a", "w w w"))
    val out = SequencePacking.packSplit(d,
        graft.text.TextAnalysis.tokenCount(col("text")), "doc_id",
        budget = 10, shardCol = "shard")
      .orderBy("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, 4L, 1L),   // doc 1: seq 0, seq_off 0, doc_off 0, len 4
      (2L, 0L, 4L, 0L, 6L, 2L),   // doc 2 head: fills seq 0 to the brim
      (2L, 1L, 0L, 6L, 7L, 2L),   // doc 2 tail: seq 1 from doc token 6
      (3L, 1L, 7L, 0L, 3L, 1L)))  // doc 3: after doc 2's tail
  }

  test("packCountedAppend: incremental ≡ batch; insertions raise; new shards start at 0") {
    import org.apache.spark.sql.functions._
    val d = Demo.table(spark, sf(), "documents")
    def cnt = graft.text.TextAnalysis.tokenCount(col("text"))
    val batch = SequencePacking.packCounted(d, cnt, "doc_id", 512, "lang")
      .orderBy("doc_id").collect()
    // grow in THREE epochs — each appends onto the carried totals
    val cuts = Seq(150L, 350L)
    val e0 = SequencePacking.packCounted(
      d.filter(col("doc_id") <= cuts.head), cnt, "doc_id", 512, "lang")
    val grown = cuts.zip(cuts.tail :+ Long.MaxValue).foldLeft(e0) {
      case (acc, (lo, hi)) =>
        acc.unionByName(SequencePacking.packCountedAppend(
          d.filter(col("doc_id") > lo && col("doc_id") <= hi), cnt,
          "doc_id", 512, "lang", SequencePacking.packTotals(acc)))
    }
    assert(grown.orderBy("doc_id").collect().sameElements(batch))
    // an id at or below the shard's packed max raises (history rewrite)
    val s = spark
    import s.implicits._
    val tiny = Seq((10L, "a", "w w"), (20L, "a", "w w w")).toDF("doc_id", "shard", "text")
    val packedTiny = SequencePacking.pack(tiny, "text", "doc_id", 10, "shard")
    val bad = Seq((15L, "a", "w")).toDF("doc_id", "shard", "text")
    val ex = intercept[Exception] {
      SequencePacking.packCountedAppend(bad,
        graft.text.TextAnalysis.tokenCount(col("text")), "doc_id", 10,
        "shard", SequencePacking.packTotals(packedTiny)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rewrite")), s"got $ex")
    // a shard unseen in the carry state starts at offset 0
    val fresh = Seq((30L, "b", "w w w w")).toDF("doc_id", "shard", "text")
    val out = SequencePacking.packCountedAppend(fresh,
      graft.text.TextAnalysis.tokenCount(col("text")), "doc_id", 10,
      "shard", SequencePacking.packTotals(packedTiny))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((30L, 0L, 0L)))
  }

  test("packShuffled: epoch-deterministic reshuffle of the packing order") {
    import org.apache.spark.sql.functions._
    val d = Demo.table(spark, sf(), "documents")
    val cnt = graft.text.TextAnalysis.tokenCount(col("text"))
    def run(epoch: Long) =
      SequencePacking.packShuffled(d, cnt, "doc_id", 512, "lang", epoch)
    val e1 = run(1L).orderBy("doc_id").collect()
    // covers every doc exactly once with the same counts as id-order
    // packing — only the order (and therefore cuts) differ
    val idOrder = SequencePacking.packCounted(d, cnt, "doc_id", 512, "lang")
      .orderBy("doc_id").collect()
    assert(e1.length == idOrder.length)
    e1.zip(idOrder).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(2) == b.getLong(2))
    }
    // the budget invariant holds in any order
    assert(e1.forall(r => r.getLong(5) >= 0 && r.getLong(5) < 512))
    // per-shard: seq ids are the prefix cuts of the ORD order — walk
    // the shard stream in (ord, doc_id) order and recompute
    e1.groupBy(_.getString(1)).foreach { case (_, rows) =>
      var acc = 0L
      rows.sortBy(r => (r.getLong(3), r.getLong(0))).foreach { r =>
        assert(r.getLong(4) == acc / 512, s"doc ${r.getLong(0)}")
        assert(r.getLong(5) == acc % 512)
        acc += r.getLong(2)
      }
    }
    // different epochs yield genuinely different orders
    val e2 = run(2L).orderBy("doc_id").collect()
    assert(e1.map(_.getLong(3)).toSeq != e2.map(_.getLong(3)).toSeq)
    // determinism across partitionings
    val again = SequencePacking.packShuffled(d.repartition(13), cnt,
      "doc_id", 512, "lang", 1L).orderBy("doc_id").collect()
    assert(e1.sameElements(again))
  }

  test("packSplitShuffled: fragments tile the epoch-shuffled stream") {
    import org.apache.spark.sql.functions._
    val d = Demo.table(spark, sf(), "documents")
    val cnt = graft.text.TextAnalysis.tokenCount(col("text"))
    val frags = SequencePacking.packSplitShuffled(d, cnt, "doc_id",
      512, "lang", epoch = 1L)
    // per-doc tiling invariants hold under any order
    val perDoc = frags.groupBy("doc_id")
      .agg(first("n_tokens").as("n"), sum("frag_len").as("s"),
        count(lit(1)).as("k"), first("n_frags").as("nf"))
    assert(perDoc.filter(col("s") =!= col("n") || col("k") =!= col("nf"))
      .count() == 0)
    // sequences fill to the budget except each shard's last
    val perSeq = frags.groupBy("shard", "seq_id")
      .agg(sum("frag_len").as("tok"))
    val lastSeq = frags.groupBy("shard").agg(max("seq_id").as("last"))
    assert(perSeq.join(lastSeq, "shard")
      .filter(col("seq_id") < col("last") && col("tok") =!= 512L)
      .count() == 0)
    // consistency with packShuffled: first fragment lands where the
    // assign-to-start formulation puts the doc
    val assigned = SequencePacking.packShuffled(d, cnt, "doc_id", 512,
      "lang", 1L).select(col("doc_id"), col("seq_id").as("a_seq"),
        col("seq_offset").as("a_off"))
    assert(frags.filter(col("doc_offset") === 0L)
      .join(assigned, "doc_id")
      .filter(col("seq_id") =!= col("a_seq")
        || col("seq_offset") =!= col("a_off")).count() == 0)
  }

  test("sequenceManifest: ordered assembly recipe per sequence") {
    import org.apache.spark.sql.functions._
    // same corpus as the packSplit case: counts 4, 13, 3; budget 10
    val d = docs((1L, "a", "w w w w"),
      (2L, "a", Seq.fill(13)("w").mkString(" ")), (3L, "a", "w w w"))
    val m = SequencePacking.sequenceManifest(
        SequencePacking.packSplit(d,
          graft.text.TextAnalysis.tokenCount(col("text")), "doc_id",
          budget = 10, shardCol = "shard"))
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(m.toSeq == Seq(
      (0L, 2L, 10L, "1:0:4;2:0:6"),   // doc1 whole + doc2's head fill seq 0
      (1L, 2L, 10L, "2:6:7;3:0:3")))  // doc2's tail from token 6, then doc3
    // at corpus scale: every manifest's triples tile its sequence —
    // parse back and check lengths sum to n_tokens, in offset order
    val corpus = Demo.table(spark, sf(), "documents")
    val mm = SequencePacking.sequenceManifest(
      SequencePacking.packSplit(corpus,
        graft.text.TextAnalysis.tokenCount(col("text")), "doc_id",
        512, "lang")).collect()
    assert(mm.nonEmpty)
    mm.foreach { r =>
      val triples = r.getString(4).split(";").map(_.split(":").map(_.toLong))
      assert(triples.length == r.getLong(2))
      assert(triples.map(_(2)).sum == r.getLong(3))
    }
  }

  test("packSplit invariants vs packCounted at sf0.001") {
    import org.apache.spark.sql.functions._
    val d = Demo.table(spark, sf(), "documents")
    val cnt = graft.text.TextAnalysis.tokenCount(col("text"))
    val frags = SequencePacking.packSplit(d, cnt, "doc_id", 512, "lang")
    // per-doc: fragments sum to n_tokens and tile contiguously from 0
    val perDoc = frags.groupBy("doc_id")
      .agg(first("n_tokens").as("n"), sum("frag_len").as("s"),
        count(lit(1)).as("k"), first("n_frags").as("nf"),
        min("doc_offset").as("lo"),
        max(col("doc_offset") + col("frag_len")).as("hi"))
    assert(perDoc.filter(col("s") =!= col("n") || col("k") =!= col("nf")
      || col("lo") =!= 0L || col("hi") =!= col("n")).count() == 0)
    // per (shard, seq): every sequence except each shard's last holds
    // exactly 512 tokens
    val perSeq = frags.groupBy("shard", "seq_id")
      .agg(sum("frag_len").as("tok"))
    val lastSeq = frags.groupBy("shard").agg(max("seq_id").as("last"))
    assert(perSeq.join(lastSeq, "shard")
      .filter(col("seq_id") < col("last") && col("tok") =!= 512L)
      .count() == 0)
    // consistency with packCounted: a doc's FIRST fragment lands exactly
    // where packCounted assigns the doc, and spanning == n_frags > 1
    val assigned = SequencePacking.packCounted(d, cnt, "doc_id", 512, "lang")
    val firstFrag = frags.filter(col("doc_offset") === 0L)
      .select(col("doc_id"), col("seq_id").as("f_seq"),
        col("seq_offset").as("f_off"), col("n_frags"))
    assert(assigned.join(firstFrag, "doc_id")
      .filter(col("seq_id") =!= col("f_seq")
        || col("seq_offset") =!= col("f_off")
        || (col("spans_boundary") =!= (col("n_frags") > 1L))).count() == 0)
    // zero-token docs are dropped
    assert(frags.count() ==
      assigned.filter(col("n_tokens") > 0).join(
        frags.groupBy("doc_id").agg(first("n_frags").as("nf")), "doc_id")
        .agg(sum("nf")).head().getLong(0))
  }

  test("pack matches the engine-side oracle formulation at sf0.001") {
    val d = Demo.table(spark, sf(), "documents")
    val out = SequencePacking.pack(d, "text", "doc_id", 512, "lang")
    // invariant: every sequence's docs fit 512 tokens of start offsets,
    // and within a shard seq ids are non-decreasing in doc order
    val bad = out.filter(org.apache.spark.sql.functions.col("seq_offset") >= 512)
    assert(bad.count() == 0)
    val n = out.count()
    assert(n == d.count())
  }
}
