package graft

import java.nio.file.{Files, Paths}

import graft.text.{Tokenizer, WordPiece, WordPieceArtifacts}
import graft.text.WordPiece.WpMerge

/** WordPiece training (likelihood-scored merges), BERT id assignment,
  * vocab.txt / tokenizer.json artifacts, and the HF-semantics id
  * serving kernel. */
class WordPieceSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(s"wp-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // The HuggingFace tokenizers-course worked example: corpus
  // hug×10 pug×5 pun×12 bun×4 hugs×5. Pair counts: (h,##u)=15,
  // (##u,##g)=20, (p,##u)=17, (##u,##n)=16, (b,##u)=4, (##g,##s)=5.
  // Symbol counts: h=15, ##u=36, ##g=20, p=17, ##n=16, b=4, ##s=5.
  // Best LIKELIHOOD score is (##g,##s): 5/(20·5) = 1/20 — NOT the
  // count argmax (##u,##g) BPE would pick.
  private val course: Seq[(String, Long)] =
    Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  test("likelihood argmax picks the HF-course pair, not the BPE count argmax") {
    val m = WordPiece.train(course, 1)
    assert(m == Seq(WpMerge(0, "##g", "##s", 5L, 20L, 5L)))
    assert(WordPiece.merged("##g", "##s") == "##gs")
    assert(WordPiece.merged("h", "##u") == "hu")
  }

  test("sealing and merge replace follow the continuation-prefix rule") {
    assert(WordPiece.sealWp("abc").toSeq == Seq("a", "##b", "##c"))
    assert(WordPiece.sealWp("a").toSeq == Seq("a"))
    // after merging (##g,##s), "hugs" is [h, ##u, ##gs]
    val m1 = WordPiece.train(course, 2)
    assert(m1(0) == WpMerge(0, "##g", "##s", 5L, 20L, 5L))
    // step 2 recounts over the merged state: ##gs now exists
    assert(m1(1).pairCount > 0)
  }

  test("training is deterministic and early-stops on a fully merged sample") {
    val a = WordPiece.train(course, 8)
    val b = WordPiece.train(course, 8)
    assert(a == b)
    // single-char words have no adjacent pairs: zero merges
    assert(WordPiece.train(Seq(("a", 5L), ("b", 3L)), 4).isEmpty)
    // a sample that merges completely stops early instead of looping
    val tinyDone = WordPiece.train(Seq(("ab", 2L)), 10)
    assert(tinyDone.length == 1)
  }

  test("model ids: [UNK]=0, alphabet in byte order, merge outputs by rank, first-wins dedup") {
    val model = WordPiece.modelOf(course, WordPiece.train(course, 3))
    val pieces = model.pieces
    assert(pieces.head == ((0L, "[UNK]")))
    val alpha = Seq("##g", "##n", "##s", "##u", "b", "h", "p")
    assert(pieces.slice(1, 1 + alpha.length).map(_._2) == alpha)
    assert(pieces.map(_._1) == pieces.indices.map(_.toLong)) // dense ids
    assert(pieces.map(_._2).distinct.length == pieces.length) // unique
    // idOf inverts pieces
    pieces.foreach { case (id, p) => assert(model.idOf(p) == id) }
  }

  test("greedy serving under the trained vocab uses longest-match over learned pieces") {
    // train enough merges to produce multi-char pieces; every training
    // word must then segment into vocabulary pieces without [UNK]
    val model = WordPiece.modelOf(course, WordPiece.train(course, 6))
    course.foreach { case (w, _) =>
      val seg = Tokenizer.wordPieces(w, model.vocab)
      assert(!seg.contains(Tokenizer.Unk), s"$w -> $seg")
      assert(seg.map(p => if (p.startsWith("##")) p.drop(2) else p)
        .mkString == w)
    }
    // a character outside the alphabet hits [UNK]
    assert(Tokenizer.wordPieces("hux", model.vocab).contains(Tokenizer.Unk))
  }

  test("vocab.txt round trip: loadVocab serves identically to the in-memory model") {
    val model = WordPiece.trainModel(docs, "text", topK = 128, numMerges = 12)
    val path = tmp("vocabtxt") + "/vocab.txt"
    WordPiece.writeVocabTxt(model, path)
    val lines = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
      .split("\n")
    assert(lines.head == "[UNK]") // id 0 on line 0
    assert(lines.length == model.pieces.length)
    val loaded = Tokenizer.loadVocab(Paths.get(path))
    val words = WordPiece.wordSample(docs, "text", 64).map(_._1)
    words.foreach { w =>
      assert(Tokenizer.wordPieces(w, loaded) ==
        Tokenizer.wordPieces(w, model.vocab))
    }
  }

  test("tokenizer.json round trip recovers ids exactly; ids kernel serves them") {
    val model = WordPiece.trainModel(docs, "text", topK = 128, numMerges = 12)
    val jpath = tmp("json") + "/tokenizer.json"
    WordPieceArtifacts.exportTokenizerJson(model, jpath)
    val loaded = WordPieceArtifacts.loadTokenizerJson(jpath)
    assert(loaded.pieces == model.pieces)
    assert(loaded.unkToken == "[UNK]" && loaded.unkId == 0L)
    assert(loaded.maxChars == WordPiece.DefaultMaxChars)
    // kernel ids equal greedy pieces mapped through the model ids
    val blob = loaded.blob
    val text = "Customer ORDER, window table!"
    val ids = WordPiece.textIdsBlob(text, blob, blob)
    val expected = Tokenizer.tokenize(text, model.vocab)
      .map(model.idOf).toSeq
    assert(ids.toSeq == expected)
  }

  test("ids kernel: HF unk semantics — whole word one unk id; over-long word one unk id") {
    // vocab that can start 'ab…' but never finish 'abq'
    val model = WordPiece.Model(Seq("a", "b", "##b", "##c"), Nil, maxChars = 6)
    val blob = WordPiece.blob(model)
    // 'abq': greedy matches a, ##b then fails on q → ONE unk id for
    // the whole word (HF is_bad), not [a, ##b, unk]
    assert(WordPiece.textIdsBlob("abq", blob, blob).toSeq == Seq(0L))
    // contrast: the legacy string kernel keeps the found pieces
    assert(Tokenizer.wordPieces("abq", model.vocab) ==
      List("a", "##b", Tokenizer.Unk))
    // a word over maxChars is one unk id without matching at all
    assert(WordPiece.textIdsBlob("abcabcabc", blob, blob).toSeq == Seq(0L))
    // at the bound it still matches
    assert(WordPiece.textIdsBlob("abbbbb", blob, blob).length > 1)
    // null-safe, multi-word, non-alphanumerics split
    assert(WordPiece.textIdsBlob(null, blob, blob).isEmpty)
    val two = WordPiece.textIdsBlob("ab, ab!", blob, blob)
    assert(two.length == 4 && two.toSeq ==
      Seq(model.idOf("a"), model.idOf("##b"), model.idOf("a"),
        model.idOf("##b")))
  }

  test("loading honors a FOREIGN file's own ids and unk token name") {
    val json = """{"version":"1.0","model":{"type":"WordPiece",
      "unk_token":"<unk>","continuing_subword_prefix":"##",
      "max_input_chars_per_word":4,
      "vocab":{"<unk>":7,"a":40,"##b":41,"ab":42}}}"""
    val p = tmp("foreign") + "/tokenizer.json"
    Files.write(Paths.get(p), json.getBytes("UTF-8"))
    val loaded = WordPieceArtifacts.loadTokenizerJson(p)
    assert(loaded.unkToken == "<unk>" && loaded.unkId == 7L)
    assert(loaded.maxChars == 4)
    val blob = loaded.blob
    // file ids are authoritative; greedy prefers the longest piece
    assert(WordPiece.textIdsBlob("ab", blob, blob).toSeq == Seq(42L))
    assert(WordPiece.textIdsBlob("abb", blob, blob).toSeq == Seq(42L, 41L))
    // failure and over-long words serve the FILE's unk id
    assert(WordPiece.textIdsBlob("ax", blob, blob).toSeq == Seq(7L))
    assert(WordPiece.textIdsBlob("ababa", blob, blob).toSeq == Seq(7L))
  }

  test("load refuses foreign model types, prefixes, and unk tokens missing from vocab") {
    def write(body: String): String = {
      val p = tmp("refuse") + "/tokenizer.json"
      Files.write(Paths.get(p), body.getBytes("UTF-8"))
      p
    }
    val notWp = write("""{"model":{"type":"BPE","vocab":{}}}""")
    val e1 = intercept[IllegalArgumentException](
      WordPieceArtifacts.loadTokenizerJson(notWp))
    assert(e1.getMessage.contains("WordPiece"))
    val badPrefix = write("""{"model":{"type":"WordPiece",
      "unk_token":"[UNK]","continuing_subword_prefix":"@@",
      "vocab":{"[UNK]":0}}}""")
    val e2 = intercept[IllegalArgumentException](
      WordPieceArtifacts.loadTokenizerJson(badPrefix))
    assert(e2.getMessage.contains("continuing_subword_prefix"))
    val noUnk = write("""{"model":{"type":"WordPiece",
      "unk_token":"[UNK]","continuing_subword_prefix":"##",
      "vocab":{"a":1}}}""")
    val e3 = intercept[IllegalArgumentException](
      WordPieceArtifacts.loadTokenizerJson(noUnk))
    assert(e3.getMessage.contains("unk_token"))
  }

  // Deterministic synthetic vocabulary large enough to train ≥32k
  // merges (the BpeKernelSpec.bigSample discipline — xorshift64,
  // fixed seed).
  private def bigSample: Seq[(String, Long)] = {
    var state = 88172645463325252L
    def next(): Int = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state >>> 33) % 26).toInt
    }
    (0 until 13000).map { i =>
      val w = new String(Array.fill(9)(('a' + next()).toChar))
      (w, 1L + (i % 5))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.head._2) }
      .toSeq.sortBy(_._1)
  }

  test("incremental trainer ≡ reference on the course, corpus, and synthetic samples") {
    assert(WordPiece.trainIncremental(course, 8) ==
      WordPiece.trainReference(course, 8))
    val real = WordPiece.wordSample(docs, "text", 256)
    assert(WordPiece.trainIncremental(real, 24) ==
      WordPiece.trainReference(real, 24))
    val sub = bigSample.take(1500)
    assert(WordPiece.trainIncremental(sub, 500) ==
      WordPiece.trainReference(sub, 500))
  }

  test("32k-merge production vocabulary trains fast (BERT-class model axis)") {
    val t0 = System.nanoTime()
    val merges = WordPiece.trainIncremental(bigSample, 32768)
    val trainSec = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 32768,
      s"vocabulary too small: trained ${merges.size} merges")
    info(f"trained 32768 merges in $trainSec%.1f s")
    assert(trainSec < 120.0, "incremental trainer should be fast")
    // ranks are dense, score components positive, vocab serves
    assert(merges.map(_.rank) == (0 until 32768))
    assert(merges.forall(m => m.pairCount > 0 && m.leftCount >= m.pairCount
      && m.rightCount >= m.pairCount))
    val model = WordPiece.modelOf(bigSample, merges)
    assert(model.pieces.length > 26 * 2)
    // every training word round-trips through greedy serving
    bigSample.take(200).foreach { case (w, _) =>
      val seg = Tokenizer.wordPieces(w, model.vocab)
      assert(!seg.contains(Tokenizer.Unk))
      assert(seg.map(p => if (p.startsWith("##")) p.drop(2) else p)
        .mkString == w)
    }
  }

  test("score comparison is exact where counts are sub-2^26 and ties break (cnt, lhs, rhs)") {
    // two pairs with EQUAL scores: (a,##b) 2/(2·2) and (c,##d) 3/(3·4)
    // → 0.5 vs 0.25 — unequal; build a true tie instead:
    // (a,##b): 2/(2·4)=0.25 and (c,##d): 2/(2·4)=0.25, tie on count 2,
    // then lhs order picks 'a'
    val sample = Seq(("ab", 2L), ("cd", 2L), ("b", 2L), ("d", 2L))
    // counts: a=2, ##b=2, c=2, ##d=2, b=2, d=2;
    // pairs (a,##b)=2 score 2/4, (c,##d)=2 score 2/4 → tie → lhs 'a'
    val m = WordPiece.train(sample, 1)
    assert(m.head.left == "a" && m.head.right == "##b")
  }
}
