package graft.text

import graft.text.UnigramLm.Entry

/**
 * HuggingFace `tokenizer.json` interop for the UNIGRAM family — the
 * [[Gpt2Artifacts]] discipline applied to the second tokenizer
 * lineage the engine trains: export a trained [[UnigramLm]] vocabulary
 * in the `tokenizers` Unigram model shape (`model.vocab` as
 * `[piece, logprob]` pairs, index = id), and load a published file
 * into the engine's serving path so a real SentencePiece-lineage
 * vocabulary (ALBERT, XLNet, T5-style) segments through the same
 * codegen'd Viterbi kernel.
 *
 * Score fidelity: the engine's Viterbi runs in exact LONG micro-unit
 * arithmetic (ln-probability × 10⁶, the determinism discipline every
 * LM oracle replays). Export emits `score_u / 10⁶` — exactly the
 * 6-dp decimal the engine serves — and load quantizes the file's
 * double back with `round(logprob × 10⁶)`. A round trip recovers
 * `score_u` EXACTLY (|score_u| ≪ 2⁵³, so the division's relative
 * error is ~10⁻¹⁶ and rounding snaps back). Loading a FOREIGN file
 * quantizes its full-precision doubles at 10⁻⁶: segmentations agree
 * with float-scored implementations except where two paths tie within
 * 10⁻⁶, where the engine's total order (score desc, piece count asc,
 * UTF-8 path order) decides deterministically — the documented
 * trade for an oracle-replayable serving path.
 *
 * Deliberately out of scope (documented, not silently wrong): the
 * SentencePiece `▁` whitespace-marker pre-tokenization — the engine's
 * word model is its whitespace tokenizer throughout; pieces are
 * served against those words. `unk_id` entries load like any other
 * piece; characters outside the vocabulary take the engine's
 * [[UnigramLm.UnkSu]] single-code-point floor.
 */
object UnigramArtifacts {

  /** Max piece length (code points) a model needs at serve time —
    * pass to the encode path so no vocabulary piece is unreachable. */
  def maxPieceLen(model: Seq[Entry]): Int =
    model.iterator.map(e =>
      e.piece.codePointCount(0, e.piece.length)).foldLeft(1)(math.max)

  /** Write `model` as a `tokenizers` Unigram `tokenizer.json`: vocab
    * pairs in (score desc, piece asc-by-UTF-8) order — the
    * best-first convention, deterministic for any input order. */
  def exportTokenizerJson(model: Seq[Entry], path: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    val m = mapper.createObjectNode()
    m.put("type", "Unigram")
    m.put("byte_fallback", false)
    val vocab = mapper.createArrayNode()
    model.sortWith { (a, b) =>
      if (a.scoreU != b.scoreU) a.scoreU > b.scoreU
      else java.util.Arrays.compareUnsigned(
        a.piece.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    }.foreach { e =>
      val pair = mapper.createArrayNode()
      pair.add(e.piece)
      pair.add(e.scoreU / 1e6)
      vocab.add(pair)
    }
    m.set[com.fasterxml.jackson.databind.JsonNode]("vocab", vocab)
    root.set[com.fasterxml.jackson.databind.JsonNode]("model", m)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, mapper.writeValueAsBytes(root))
  }

  /** Load a `tokenizers` Unigram `tokenizer.json` into the engine's
    * model shape: pieces with micro-unit scores (`round(logprob×10⁶)`),
    * counts 0 (the HF format does not carry them; serving never reads
    * them). Refuses non-Unigram model types rather than mis-serving. */
  def loadTokenizerJson(path: String): Seq[Entry] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val m = root.get("model")
    require(m != null && m.get("type") != null &&
      m.get("type").asText() == "Unigram",
      s"$path: expected model.type Unigram, got " +
        Option(m).flatMap(x => Option(x.get("type")))
          .map(_.asText()).getOrElse("<absent>"))
    val vocab = m.get("vocab")
    require(vocab != null && vocab.isArray,
      s"$path: model.vocab must be an array of [piece, logprob] pairs")
    val out = Seq.newBuilder[Entry]
    val it = vocab.elements()
    while (it.hasNext) {
      val pair = it.next()
      require(pair.isArray && pair.size() == 2,
        s"$path: malformed vocab entry $pair")
      out += Entry(pair.get(0).asText(), 0L,
        math.round(pair.get(1).asDouble() * 1e6))
    }
    out.result()
  }
}
