package graft.text

/**
 * HuggingFace `tokenizer.json` interop for the WORDPIECE family — the
 * [[Gpt2Artifacts]] / [[UnigramArtifacts]] discipline applied to the
 * third tokenizer lineage the engine trains: export a trained
 * [[WordPiece.Model]] in the `tokenizers` WordPiece model shape
 * (`model.vocab` as a piece → id object, `unk_token`,
 * `continuing_subword_prefix`, `max_input_chars_per_word`), and load a
 * published file (BERT-style) into the engine's id-serving kernel
 * ([[WordPiece.textIdsBlob]]), which implements the format's reference
 * inference semantics exactly: greedy longest-match, over-long words
 * one unk id, greedy failure → the WHOLE word one unk id.
 *
 * Id fidelity: ids are integers on both sides — a round trip recovers
 * the assignment EXACTLY (no quantization axis like Unigram scores).
 * The FILE's ids are authoritative on load, including the unk token's
 * own id (a foreign file naming its unknown piece "<unk>" or "[unk]"
 * serves ITS id wherever the engine's matcher fails).
 *
 * Deliberately out of scope (documented, not silently wrong): the
 * BertPreTokenizer/normalizer pipeline stages of a full HF tokenizer —
 * the engine's word model is its lowercase `[a-z0-9]+` pre-tokenizer
 * throughout this family (the [[Tokenizer]] contract); vocabulary
 * pieces containing characters that pre-tokenizer can never emit
 * (punctuation pieces, CJK characters, "[CLS]"/"[SEP]" specials) load
 * without error and are simply unreachable at match time.
 */
object WordPieceArtifacts {

  /** A loaded WordPiece artifact: (id, piece) rows in file id order,
    * the file's unk token and its id, and the word-length bound. */
  final case class Loaded(pieces: Seq[(Long, String)], unkToken: String,
      unkId: Long, maxChars: Int) {
    /** The id-serving plan literal ([[WordPiece.blobOf]]). */
    def blob: String = WordPiece.blobOf(pieces, unkId, maxChars)
  }

  /** Write `model` as a `tokenizers` WordPiece `tokenizer.json`:
    * vocab object in id order (insertion-ordered, the HF convention). */
  def exportTokenizerJson(model: WordPiece.Model, path: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    val m = mapper.createObjectNode()
    m.put("type", "WordPiece")
    m.put("unk_token", WordPiece.Unk)
    m.put("continuing_subword_prefix", "##")
    m.put("max_input_chars_per_word", model.maxChars)
    val vocab = mapper.createObjectNode()
    model.pieces.foreach { case (id, piece) => vocab.put(piece, id) }
    m.set[com.fasterxml.jackson.databind.JsonNode]("vocab", vocab)
    root.set[com.fasterxml.jackson.databind.JsonNode]("model", m)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, mapper.writeValueAsBytes(root))
  }

  /** Load a `tokenizers` WordPiece `tokenizer.json`. Refuses rather
    * than mis-serves: non-WordPiece model types, a continuation prefix
    * other than "##" (the matcher hardwires it), an unk token absent
    * from the vocab, and pieces containing the blob's reserved control
    * separators (no published vocabulary does). */
  def loadTokenizerJson(path: String): Loaded = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val m = root.get("model")
    require(m != null && m.get("type") != null &&
      m.get("type").asText() == "WordPiece",
      s"$path: expected model.type WordPiece, got " +
        Option(m).flatMap(x => Option(x.get("type")))
          .map(_.asText()).getOrElse("<absent>"))
    val prefix = Option(m.get("continuing_subword_prefix"))
      .map(_.asText()).getOrElse("##")
    require(prefix == "##",
      s"$path: continuing_subword_prefix '$prefix' unsupported (engine" +
        " matcher hardwires '##')")
    val unkToken = Option(m.get("unk_token")).map(_.asText())
      .getOrElse(WordPiece.Unk)
    val maxChars = Option(m.get("max_input_chars_per_word"))
      .map(_.asInt()).getOrElse(WordPiece.DefaultMaxChars)
    val vocab = m.get("vocab")
    require(vocab != null && vocab.isObject,
      s"$path: model.vocab must be a piece -> id object")
    val out = Seq.newBuilder[(Long, String)]
    var unkId = -1L
    val it = vocab.fields()
    while (it.hasNext) {
      val e = it.next()
      out += ((e.getValue.asLong(), e.getKey))
      if (e.getKey == unkToken) unkId = e.getValue.asLong()
    }
    require(unkId >= 0,
      s"$path: unk_token '$unkToken' not present in model.vocab")
    Loaded(out.result().sortBy(_._1), unkToken, unkId, maxChars)
  }
}
