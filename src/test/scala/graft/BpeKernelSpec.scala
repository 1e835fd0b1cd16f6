package graft

import graft.text.{Bpe, Gpt2Artifacts}
import graft.text.Bpe.Merge
import org.apache.spark.sql.functions._

/**
 * The production-size byte-BPE path (round-14 verdict ask #1):
 *
 *  1. the INCREMENTAL trainer (`trainSealed`, heap + per-word diffs)
 *     produces the bit-identical merge sequence to the reference
 *     recount-everything loop the DuckDB oracles replay;
 *  2. the rank-SEQUENTIAL serving kernel (`applySequential` via
 *     `bpe_byte_symbols`) is bit-identical to the replace fold and the
 *     driver fold on every testdata document;
 *  3. both survive a ≥32k-merge TRAINED table — the size at which the
 *     numMerges-deep replace fold dies at plan analysis (and is now
 *     guarded against).
 */
class BpeKernelSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  /** Deterministic synthetic vocabulary large enough to train ≥32k
    * merges (testdata's pretoken vocabulary is ~61 types by design —
    * far too small for a production-size table): ~13000 distinct
    * 9-letter words from a fixed-seed xorshift. High letter diversity keeps
    * most pair counts at 1, so merge STEPS stay close to the symbol
    * budget instead of collapsing shared structure in a few steps. */
  private def bigSample: Seq[(String, Long)] = {
    var state = 88172645463325252L
    def next(): Int = { // xorshift64 — fixed seed, fully deterministic
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state >>> 33) % 26).toInt
    }
    (0 until 13000).map { i =>
      val w = new String(Array.fill(9)(('a' + next()).toChar))
      (w, 1L + (i % 5))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.head._2) }
      .toSeq.sortBy(_._1)
  }

  // ------------------------------------------------- trainer parity

  test("fast trainer ≡ reference trainer on testdata word samples (both alphabets)") {
    val sample = Bpe.wordSample(docs, "text", 256)
    for (n <- Seq(1, 8, 24, 64)) {
      val fastC = Bpe.train(sample, n)
      val refC = Bpe.trainSealedReference(
        sample.map { case (w, f) => (Bpe.seal(w), f) }, n)
      assert(fastC == refC, s"char alphabet diverged at numMerges=$n")
      val fastB = Bpe.trainBytes(sample, n)
      val refB = Bpe.trainSealedReference(
        sample.map { case (w, f) => (Bpe.sealBytes(w), f) }, n)
      assert(fastB == refB, s"byte alphabet diverged at numMerges=$n")
    }
  }

  test("fast trainer ≡ reference trainer on the pretoken sample and past early-stop") {
    val sample = Bpe.pretokenSample(docs, "text", 256)
    // 4096 exceeds the sample's merge capacity → exercises early stop
    for (n <- Seq(24, 4096)) {
      val fast = Bpe.trainBytes(sample, n)
      val ref = Bpe.trainSealedReference(
        sample.map { case (w, f) => (Bpe.sealBytes(w), f) }, n)
      assert(fast == ref, s"pretok byte alphabet diverged at numMerges=$n")
      if (n == 4096) assert(fast.size < n, "expected early stop")
    }
  }

  test("fast trainer ≡ reference trainer on tie/overlap torture samples") {
    val tortures = Seq(
      // overlap counting + chained merges
      Seq(("aaaaa", 3L), ("aaa", 2L)),
      // count ties broken lexicographically
      Seq(("cd", 2L), ("ab", 2L), ("ba", 2L)),
      // frequency-weighted pairs + shared prefixes
      Seq(("ab", 5L), ("abc", 3L), ("bc", 4L), ("abcd", 1L)),
      // a pair whose count changes repeatedly as neighbours merge
      Seq(("xyxyxy", 2L), ("yx", 7L), ("xy", 1L)))
    for (s <- tortures; n <- Seq(1, 2, 3, 10)) {
      val fast = Bpe.train(s, n)
      val ref = Bpe.trainSealedReference(
        s.map { case (w, f) => (Bpe.seal(w), f) }, n)
      assert(fast == ref, s"diverged on $s at numMerges=$n")
    }
  }

  test("fast trainer ≡ reference trainer on a 500-merge slice of the big vocabulary") {
    val sub = bigSample.take(1500)
    val fast = Bpe.trainBytes(sub, 500)
    val ref = Bpe.trainSealedReference(
      sub.map { case (w, f) => (Bpe.sealBytes(w), f) }, 500)
    assert(fast == ref)
    assert(fast.size == 500)
  }

  // -------------------------------------------------- kernel parity

  test("kernel ≡ replace fold ≡ driver fold on every testdata document (pretok path)") {
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    val viaFold = Bpe.encodeDocsBytesPretok(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
    val viaKernel = Bpe.encodeDocsBytesPretokKernel(docs, "text", "doc_id",
      merges).orderBy("doc_id").collect()
    assert(viaFold.length == viaKernel.length && viaFold.length > 0)
    viaFold.zip(viaKernel).foreach { case (f, k) =>
      assert(f == k, s"doc ${f.get(0)}: fold=$f kernel=$k")
    }
    // driver twin on the distinct pretokens of the corpus
    val words = docs.select(explode(Bpe.pretokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.length > 10)
    words.foreach { w =>
      assert(Bpe.encodeWordBytesKernel(w, merges).toSeq ==
        Bpe.encodeWordBytes(w, merges).toSeq, s"word '$w'")
    }
  }

  test("kernel ≡ replace fold on the whitespace-word byte path") {
    val merges = Bpe.trainBytes(Bpe.wordSample(docs, "text", 256), 24)
    val viaFold = Bpe.encodeDocsBytes(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
    val viaKernel = Bpe.encodeDocsBytesKernel(docs, "text", "doc_id",
      merges).orderBy("doc_id").collect()
    viaFold.zip(viaKernel).foreach { case (f, k) => assert(f == k) }
  }

  test("id kernel ≡ literal-map id path on every testdata document") {
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    val viaMap = Bpe.encodeDocsBytesPretokIds(docs, "text", "doc_id",
      merges).orderBy("doc_id").collect()
    val viaKernel = Bpe.encodeDocsBytesPretokIdsKernel(docs, "text",
      "doc_id", merges).orderBy("doc_id").collect()
    viaMap.zip(viaKernel).foreach { case (m, k) => assert(m == k) }
  }

  test("kernel count column ≡ fold count column") {
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    val both = docs.select(
      Bpe.tokenCountColBytesPretok("text", merges).as("a"),
      Bpe.tokenCountColBytesPretokKernel("text", merges).as("b"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("kernel is exactly sequential on adversarial tables (re-created pair, duplicate pair ranks)") {
    // rank 0 references (ab,c) which only EXISTS after rank 1 builds ab:
    // the sequential fold never applies rank 0; GPT-2's min-rank-greedy
    // loop would — the kernel must match the fold
    def m(rank: Int, l: String, r: String) = Merge(rank, l, r, 1L)
    val h = "abc".getBytes("UTF-8").map(b => f"${b & 0xff}%02X")
    val (a, b, c) = (h(0), h(1), h(2))
    val adversarial = Seq(m(0, a + b, c), m(1, a, b))
    assert(Bpe.encodeWordBytesKernel("abc", adversarial).toSeq ==
      Bpe.encodeWordBytes("abc", adversarial).toSeq)
    // duplicate pair at two ranks, with an intervening merge that
    // re-creates the pair: both ranks must fire, in order
    val dup = Seq(m(0, a, b), m(1, a + b, c), m(2, a, b))
    for (w <- Seq("abc", "ababc", "abcab", "aabbcc", "abcabcabc"))
      assert(Bpe.encodeWordBytesKernel(w, dup).toSeq ==
        Bpe.encodeWordBytes(w, dup).toSeq, s"word '$w'")
    // randomized cross-check over the trained table's prefixes
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    for (k <- 0 to merges.size; w <- Seq("the table", "a", "", "value"))
      assert(Bpe.encodeWordBytesKernel(w, merges.take(k)).toSeq ==
        Bpe.encodeWordBytes(w, merges.take(k)).toSeq)
  }

  // -------------------------------------------- production-size table

  test("32k-merge trained table: trains in-memory, kernel ≡ driver fold, plan survives") {
    val t0 = System.nanoTime()
    val merges = Bpe.trainBytes(bigSample, 32768)
    val trainSec = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 32768,
      s"vocabulary too small: trained ${merges.size} merges")
    info(f"trained 32768 merges in $trainSec%.1f s")
    assert(trainSec < 120.0, "incremental trainer should be fast")

    // driver kernel ≡ driver replace fold on a bounded word set (the
    // fold is O(numMerges) per word — usable for a parity anchor, not
    // for serving)
    val words = bigSample.take(150).map(_._1) ++
      Seq("wbaa", "wbbbb", "zzz", "", "a", "wcafeé", "𝄞")
    words.foreach { w =>
      val k = Bpe.encodeWordBytesKernel(w, merges)
      assert(k.toSeq == Bpe.encodeWordBytes(w, merges).toSeq, s"word '$w'")
      assert(Bpe.decodeByteSymbols(k.toSeq) == w) // no-unk round trip
    }

    // the COLUMN kernel path analyzes and executes at 32k merges —
    // the exact size where the replace fold dies (guard below)
    import spark.implicits._
    val df = bigSample.take(64).map(_._1).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val viaPlan = Bpe.encodeDocsBytesPretokKernel(df, "text", "doc_id",
      merges).orderBy("doc_id").collect()
    val blob = Bpe.mergeBlob(merges)
    assert(blob.length < 2 * 1024 * 1024, "blob should stay sub-MB-ish")
    assert(viaPlan.length == 64 && viaPlan.forall(_.getLong(1) > 0))

    // ids are total at production size too
    val viaIds = Bpe.encodeDocsBytesPretokIdsKernel(df, "text", "doc_id",
      merges).orderBy("doc_id").collect()
    assert(viaIds.length == 64 && viaIds.forall(_.getLong(1) > 0))

    // SPECIALS AT PRODUCTION SIZE: the text kernel splits on the
    // special and serves each segment through the 32k table — the
    // segment-interleave semantics is merge-count-independent, proven
    // at the size real artifacts ship
    val symToId = Bpe.byteVocab(merges).map(_.swap).toMap
    val eot = 256L + merges.size
    val spBlob = Bpe.mergeBlobWithSpecials(merges, symToId,
      Seq("<|endoftext|>" -> eot))
    val flat = Bpe.mergeBlobWithIds(merges, symToId)
    val segs = bigSample.take(16).map(_._1)
    val text = segs.mkString("<|endoftext|>")
    val ids = Bpe.textIdsBlob(text, spBlob, spBlob).toSeq
    val p = java.util.regex.Pattern.compile(Bpe.Gpt2Pretok)
    def segIds(seg: String): Seq[Long] = {
      val mt = p.matcher(seg)
      val b = Seq.newBuilder[Long]
      while (mt.find()) b ++= Bpe.wordByteIdsBlob(mt.group(), flat, flat)
      b.result()
    }
    assert(ids == segs.map(segIds).reduce((a, b) => a ++ (eot +: b)))
    assert(ids.count(_ == eot) == segs.size - 1)
    // specials-aware decode inverts the stream under the 32k model
    val model = Gpt2Artifacts.Model(merges, symToId,
      Seq("<|endoftext|>" -> eot))
    assert(Gpt2Artifacts.decodeIds(ids, model) == text)
  }

  test("the replace fold refuses production-size tables with a named limit") {
    val merges = (0 until 513).map(i => Merge(i, f"$i%02X", "00", 1L))
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeDocsBytesPretok(docs, "text", "doc_id", merges).collect()
    }
    assert(e.getMessage.contains("kernel"))
  }

  test("decodeIds inverts the id stream: ids → text, byte-exact; unknown ids refuse") {
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    val blob = Bpe.mergeBlob(merges)
    for (w <- Seq("the table", "value", "é𝄞 mixed", "", "a  's b")) {
      val ids = Bpe.wordByteIdsBlob(w, blob, blob)
      assert(Bpe.decodeIds(ids.toSeq, merges) == w, s"word '$w'")
    }
    val e = intercept[IllegalArgumentException] {
      Bpe.decodeIds(Seq(256L + merges.size), merges) // one past the vocab
    }
    assert(e.getMessage.contains("unknown token id"))
  }

  // ------------------------------------------ input-axis work bound

  test("overlong unbroken runs encode in bounded time via fixed chunks (input-axis bound)") {
    // Crawl corpora contain megabyte unbroken runs (minified JS,
    // base64) that GPT-2 pretokenization emits as ONE pretoken; the
    // unbounded kernel is O(len²) per pretoken (round-14 verdict —
    // the tokenizer's last open scale axis). The serving entry points
    // chunk at MaxPretokenBytes, so per-document work is linear.
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    val blob = Bpe.mergeBlob(merges)
    val model = Bpe.modelForBlob(blob, blob)
    val run = "ab" * 1500000 // one 3 MB unbroken pretoken
    val t0 = System.nanoTime()
    val got = Bpe.wordByteSymbolsBlob(run, blob, blob)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"bounded kernel took $secs s on a 3 MB run")
    // semantics: each MaxPretokenBytes-byte chunk encoded independently
    val hexSyms = run.getBytes("UTF-8").map(b => f"${b & 0xff}%02X")
    val expected = hexSyms.grouped(Bpe.MaxPretokenBytes)
      .flatMap(ch => Bpe.applySequential(ch.toArray, model)).toArray
    assert(got.sameElements(expected))
    // the no-unk round trip survives chunking
    assert(Bpe.decodeByteSymbols(got.toSeq) == run)
    // ids path uses the same bound
    val ids = Bpe.wordByteIdsBlob(run, blob, blob)
    assert(ids.length == got.length)
  }

  test("chunk boundary semantics: merges never span chunks; sub-bound inputs are untouched") {
    import Bpe.Merge
    // aa, then aa+a — a 3-byte output whose final merge can straddle an
    // even chunk boundary, making the documented divergence visible
    val merges = Seq(Merge(0, "61", "61", 0L), Merge(1, "6161", "61", 0L))
    val blobClean = Bpe.mergeBlob(merges)
    val model = Bpe.modelForBlob(blobClean, blobClean)
    val bound = Bpe.MaxPretokenBytes
    // exactly at the bound: single chunk — bit-identical to unbounded
    val atBound = "a" * bound
    val unb = Bpe.applySequential(
      atBound.getBytes("UTF-8").map(b => f"${b & 0xff}%02X"), model)
    assert(Bpe.wordByteSymbolsBlob(atBound, blobClean, blobClean)
      .sameElements(unb))
    // one past the bound: the final (aa, a) merge would span the
    // boundary — bounded output keeps the chunks independent
    val over = "a" * (bound + 1)
    val bounded = Bpe.wordByteSymbolsBlob(over, blobClean, blobClean)
    assert(bounded.length == bound / 2 + 1)
    assert(bounded.take(bound / 2).forall(_ == "6161") &&
      bounded.last == "61")
    val unbounded = Bpe.applySequential(
      over.getBytes("UTF-8").map(b => f"${b & 0xff}%02X"), model)
    // the unbounded fold WOULD have merged across the boundary — the
    // divergence is real, confined to >16 KiB unbroken runs, and
    // documented on MaxPretokenBytes
    assert(unbounded.last == "616161" && !bounded.sameElements(unbounded))
    // round trip still exact
    assert(Bpe.decodeByteSymbols(bounded.toSeq) == over)
  }

  // ---------------------------------------- blob id-section coverage

  test("a trimmed external id section refuses to serve instead of guessing ids") {
    import Bpe.Merge
    val merges = Seq(Merge(0, "61", "61", 0L))
    val fullIds = Bpe.byteVocab(merges).map(_.swap).toMap
    // complete artifact: serves the FILE's ids (shifted to prove the
    // override is honored, not the derived assignment)
    val shifted = fullIds.map { case (s, i) => (s, i + 1000L) }
    val okBlob = Bpe.mergeBlobWithIds(merges, shifted)
    assert(Bpe.wordByteIdsBlob("aa", okBlob, okBlob).toSeq == Seq(1256L))
    // trimmed artifact missing the merge output: the derived default
    // (256) could collide with the file's real id for ANOTHER token —
    // the guard must fire, not silently fall back (round-14 advice)
    val noMerge = Bpe.mergeBlobWithIds(merges, shifted - "6161")
    intercept[IllegalStateException] {
      Bpe.wordByteIdsBlob("aa", noMerge, noMerge)
    }
    // trimmed artifact missing a base byte symbol: same refusal
    val noBase = Bpe.mergeBlobWithIds(merges, shifted - "62")
    intercept[IllegalStateException] {
      Bpe.wordByteIdsBlob("b", noBase, noBase)
    }
    // symbols the word never produces don't trip the guard
    assert(Bpe.wordByteIdsBlob("aa", noBase, noBase).toSeq == Seq(1256L))
  }

  test("blob round-trip and memoization") {
    val merges = Bpe.trainBytes(Bpe.pretokenSample(docs, "text", 256), 24)
    val blob = Bpe.mergeBlob(merges)
    val model = Bpe.modelForBlob(blob, blob)
    assert(model.size == merges.size)
    // same reference → same model instance (ThreadLocal hit)
    assert(Bpe.modelForBlob(blob, blob) eq model)
    // same CONTENT, different reference → same parsed model (shared LRU)
    assert(Bpe.modelForBlob(new String(blob), new String(blob)) eq model)
  }
}
