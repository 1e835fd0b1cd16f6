package graft.text

import graft.dedup.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding VOCABULARY INDUCTION trained in-engine (Sennrich,
 * Haddow & Birch 2016 — the merge-learning loop every BPE/GPT-2-style
 * tokenizer ships), plus application of the learned merges to the
 * corpus. This closes the "tokenize with a FILE vocab" gap: the engine
 * can now derive its own subword vocabulary from the corpus it is
 * about to pack.
 *
 * Training follows the standard industrial shape: word TYPES and their
 * corpus frequencies are counted distributed (one explode + hash agg),
 * the trainer then iterates over a BOUNDED top-K sample of types on
 * the driver (deterministic order: frequency desc, word asc — the same
 * bounded-sample pattern as `EmbeddingOps.kmeansCentroids`'s ≤4096-row
 * md5-ordered sample). Each merge step counts adjacent symbol pairs
 * weighted by word frequency, picks the argmax (count desc, then
 * lexicographic (left, right) — a total order, so no RNG and no
 * engine-dependent ties), and rewrites the vocabulary.
 *
 * Every step is integer + string arithmetic, so a DuckDB oracle
 * REPLAYS the whole trainer exactly ([[oracleTrainSql]] unrolls the
 * merge steps as CTE chains, the `KmeansOracles` discipline — no
 * baked-in merge literals) and replays ENCODING as a recursive CTE
 * that applies the derived merges rank by rank ([[oracleEncodeSql]]).
 *
 * Symbol representation: every symbol is individually bracketed by
 * control characters, `⟨s⟩` with ⟨ = U+001E and ⟩ = U+001F, so "merge
 * pair (l, r)" is literally `replace("⟨l⟩⟨r⟩" → "⟨lr⟩")`: a match
 * consumes only its OWN brackets, never a neighbour's, which makes
 * plain string replace (leftmost, non-overlapping, continue after the
 * replacement) EXACTLY Sennrich's merge rule — `aaaaa` under (a,a)
 * becomes [aa, aa, a], as the reference `re.sub` with \S-lookarounds
 * produces. (A single shared separator would instead eat the next
 * pair's boundary: [aa, a, a] — caught by spec before shipping.)
 * java.lang.String.replace and SQL replace() share these semantics.
 * Symbols can never contain the brackets — they are control chars,
 * filtered from words on both sides.
 *
 * Scale shape: the corpus-wide work is ONE token explode + hash
 * aggregation (training) and ONE map-side projection (encoding — the
 * merge chain is `numMerges` codegen'd string replaces inside a
 * `transform` lambda; no shuffle, no join, no driver state at encode
 * time). The driver holds only the ≤ topK sampled types and the merge
 * table.
 */
object Bpe {

  /** Symbol open bracket (U+001E record separator). */
  val Open: Char = '\u001E'
  /** Symbol close bracket (U+001F unit separator). */
  val Close: Char = '\u001F'
  private val O = Open.toString
  private val C = Close.toString

  final case class Merge(rank: Int, left: String, right: String,
      pairCount: Long)

  /** Unsigned UTF-8 byte comparison — Spark UTF8String / DuckDB binary
    * collation, which Java's UTF-16 compareTo does not match above the
    * BMP. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** `⟨c1⟩⟨c2⟩…` character-symbol representation of a word. Iterates
    * CODE POINTS, not UTF-16 units — the engine's `regexp_replace(…,
    * '(.)', …)` seal matches per code point (Java regex and RE2 both),
    * so a char-level loop would split astral symbols on the driver but
    * not in the plan (caught by the "𝄞" spec). */
  def seal(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 3)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.append(Open).appendCodePoint(cp).append(Close)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Symbols of a sealed representation. */
  private def unseal(sym: String): Array[String] =
    if (sym.isEmpty) Array.empty
    else sym.substring(1, sym.length - 1).split(C + O, -1)

  private val HexDigits = "0123456789ABCDEF"

  /** `⟨hh⟩⟨hh⟩…` BYTE-symbol representation: each UTF-8 byte of the
    * word as its two-UPPERCASE-hex-digit symbol — the GPT-2/tiktoken
    * alphabet (Radford et al. 2019 §2.2): 256 byte symbols cover EVERY
    * string, so there is no unk by construction. Hex digits are ASCII,
    * so the trainer's unsigned-byte argmax tie order, the engine's
    * UTF8String collation and DuckDB's binary ORDER BY agree for free
    * (the [[utf8Compare]] subtlety the char alphabet needs vanishes). */
  def sealBytes(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 4)
    var i = 0
    while (i < bytes.length) {
      sb.append(Open)
        .append(HexDigits.charAt((bytes(i) >> 4) & 0xf))
        .append(HexDigits.charAt(bytes(i) & 0xf))
        .append(Close)
      i += 1
    }
    sb.toString
  }

  /** Inverse of the byte alphabet: BPE symbols (concatenated hex byte
    * pairs) → UTF-8 bytes → string. Total on any [[trainBytes]] /
    * [[encodeWordBytes]] output — the round-trip anchor of the no-unk
    * property (spec round-trips non-ASCII and astral text byte-exactly). */
  def decodeByteSymbols(syms: Seq[String]): String = {
    val hexStr = syms.mkString
    val out = new Array[Byte](hexStr.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(hexStr.charAt(2 * i), 16) << 4) |
        Character.digit(hexStr.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The ASCII whitespace class, written out explicitly: Java's `\s`
    * includes \x0B where RE2's excludes it, so both the engine pattern
    * and the DuckDB oracle's pattern use this class and agree BY
    * CONSTRUCTION on every input (not just inputs that avoid the
    * divergent characters). */
  private val Ws = " \\t\\n\\x0B\\f\\r"

  /**
   * GPT-2's pre-tokenization regex (Radford et al. 2019 — the
   * `gpt2/encoder.py` pattern, reference `src/models/llm_matcher.py`'s
   * model lineage): contraction suffixes, then letter / digit /
   * other-punctuation runs each CARRYING one optional leading space
   * (" the" is one pretoken — the property that makes byte-BPE vocab
   * entries word-boundary-aware), then whitespace runs donating their
   * final space to the following token (`(?![^ \t…])` backtracks the
   * greedy run by one). Case-sensitive, no lowercasing — unlike the
   * whitespace tokenizer, this is the exact stream production byte-BPE
   * vocabularies are trained on.
   */
  val Gpt2Pretok: String =
    s"'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^$Ws\\p{L}\\p{N}]+" +
      s"|[$Ws]+(?![^$Ws])|[$Ws]+"

  /** The GPT-2 pretoken ARRAY of a text column (marker-bracket
    * carriers dropped, as everywhere in this tokenizer family). The
    * alternation is total — every character lands in some pretoken —
    * so encode→decode round-trips the full text byte-exactly. */
  def pretokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(regexp_extract_all(c, lit(Gpt2Pretok), lit(0)),
      t => !t.contains(O) && !t.contains(C))

  /** [[wordSample]] over GPT-2 pretokens: top `topK` pretoken types by
    * (frequency desc, pretoken asc) — the same bounded driver collect,
    * with spaces/case preserved (pretokens are case-sensitive and
    * space-carrying by design). */
  def pretokenSample(docs: DataFrame, textCol: String,
      topK: Int): Seq[(String, Long)] =
    docs.select(explode(pretokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Driver-side merge learning over a bounded (word, freq) sample.
    * Stops early if no adjacent pair remains (fully merged vocab). */
  def train(sample: Seq[(String, Long)], numMerges: Int): Seq[Merge] =
    trainSealed(sample.map { case (w, f) => (seal(w), f) }, numMerges)

  /** Byte-level merge learning (GPT-2 lineage): [[trainSealed]] over
    * the byte-sealed sample — the loop is shared with [[train]]; the
    * alphabet is a parameter of the sealing only. */
  def trainBytes(sample: Seq[(String, Long)], numMerges: Int): Seq[Merge] =
    trainSealed(sample.map { case (w, f) => (sealBytes(w), f) }, numMerges)

  /** The merge loop over an already-sealed vocabulary — shared by the
    * char-level ([[train]]) and byte-level ([[trainBytes]]) trainers:
    * the loop only ever sees bracketed symbols, so the alphabet is a
    * parameter of the SEALING, not of the learning. */
  private def trainSealed(sample: Seq[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    var vocab = sample
    val out = Seq.newBuilder[Merge]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (sym, f) =>
        val syms = unseal(sym)
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax: count desc, then lexicographic (left, right) asc in
        // UNSIGNED UTF-8 BYTE order — the collation Spark's UTF8String
        // and DuckDB's binary ORDER BY both use; Java String compareTo
        // (UTF-16 units) disagrees for supplementary-plane vs U+E000+
        // symbols, so the engine-portability claim needs the byte order
        val ((l, r), c) = counts.min(
          Ordering.fromLessThan[((String, String), Long)] {
            case (((a1, b1), n1), ((a2, b2), n2)) =>
              if (n1 != n2) n1 > n2
              else {
                val ca = utf8Compare(a1, a2)
                if (ca != 0) ca < 0 else utf8Compare(b1, b2) < 0
              }
          })
        out += Merge(k, l, r, c)
        val from = O + l + C + O + r + C
        val to = O + l + r + C
        vocab = vocab.map { case (s, f) => (s.replace(from, to), f) }
        k += 1
      }
    }
    out.result()
  }

  /** Reference (driver-side) application of a merge table to one word —
    * the same seal → rank-ordered replace → unseal chain the Column
    * version compiles into; spec-level parity anchor. */
  def encodeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var s = seal(word)
    merges.foreach { m =>
      s = s.replace(O + m.left + C + O + m.right + C,
        O + m.left + m.right + C)
    }
    unseal(s)
  }

  /** [[encodeWord]] over the byte alphabet — the driver twin of the
    * byte-level Column encoder; `decodeByteSymbols(encodeWordBytes(w,
    * m)).sameElements(w)` for EVERY w and m (no unk). */
  def encodeWordBytes(word: String, merges: Seq[Merge]): Array[String] = {
    var s = sealBytes(word)
    merges.foreach { m =>
      s = s.replace(O + m.left + C + O + m.right + C,
        O + m.left + m.right + C)
    }
    unseal(s)
  }

  /** Bounded deterministic word-type sample: top `topK` types by
    * (frequency desc, word asc) over [[TextDedup.tokens]] — a ≤ topK-row
    * driver collect, the documented bounded-training-sample pattern. */
  def wordSample(docs: DataFrame, textCol: String, topK: Int): Seq[(String, Long)] =
    docs.select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .where(!col("word").contains(O) && !col("word").contains(C))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train on the corpus and return the merge table as a DataFrame:
    * (rank, lhs, rhs, pair_count). */
  def trainedMergesDf(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, topK: Int): DataFrame =
    mergesToDf(spark, train(wordSample(docs, textCol, topK), numMerges))

  /** [[trainedMergesDf]] over the byte alphabet (same bounded sample —
    * the sealing, not the sampling, is what differs). */
  def trainedByteMergesDf(spark: SparkSession, docs: DataFrame,
      textCol: String, numMerges: Int, topK: Int): DataFrame =
    mergesToDf(spark,
      trainBytes(wordSample(docs, textCol, topK), numMerges))

  /** [[trainedByteMergesDf]] over GPT-2 PRETOKENS instead of
    * lowercased whitespace words — the full production composition
    * (pretokenize → UTF-8 bytes → merges): vocab entries carry their
    * leading space and case. Sampling differs, sealing and loop are
    * the shared [[sealBytes]]/[[trainSealed]]. */
  def trainedBytePretokMergesDf(spark: SparkSession, docs: DataFrame,
      textCol: String, numMerges: Int, topK: Int): DataFrame =
    mergesToDf(spark,
      trainBytes(pretokenSample(docs, textCol, topK), numMerges))

  private def mergesToDf(spark: SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Fold a merge table over an already-sealed Column (codegen'd string
    * replaces) and unseal to the symbol array — shared by the char- and
    * byte-level encoders. */
  private def foldMerges(sealed0: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val merged = merges.foldLeft(sealed0) { (cc, m) =>
      org.apache.spark.sql.functions.replace(cc,
        lit(O + m.left + C + O + m.right + C),
        lit(O + m.left + m.right + C))
    }
    split(trim(merged, O + C), C + O)
  }

  /** Column expression: the BPE symbol ARRAY of one word under `merges`
    * — seal, fold the merge chain (codegen'd string replaces), unseal. */
  private def encodeWordCol(w: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column = {
    // (?s) DOTALL: Java's '.' excludes the line terminators U+0085/
    // U+2028/U+2029, which the \s+ tokenizer does NOT strip (Java \s
    // lacks them) — without DOTALL a word containing one is left
    // partially unsealed and the merge fold produces garbage symbols,
    // diverging from the driver seal() (a code-point loop) and the
    // DuckDB oracle (RE2 '.' excludes only \n, which \s does strip).
    foldMerges(regexp_replace(w, "(?s)(.)", O + "$1" + C), merges)
  }

  /** Byte-level Column encoder: `hex(encode(w, UTF-8))` is the
    * UPPERCASE hex of the word's UTF-8 bytes — the engine twin of
    * [[sealBytes]]; `(..)` brackets each byte's hex pair (the hex
    * string's length is always even, and hex digits are ASCII, so none
    * of the char alphabet's DOTALL/code-point subtleties apply). */
  private def encodeWordBytesCol(w: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    foldMerges(
      regexp_replace(hex(encode(w, "UTF-8")), "(..)", O + "$1" + C),
      merges)

  /** Per-document BPE token count under `merges` — the countExpr that
    * feeds [[SequencePacking.packCounted]]/[[SequencePacking.shardByTokenBudget]]
    * with TRAINED-tokenizer counts instead of the whitespace proxy. */
  def tokenCountCol(textCol: String, merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val toks = filter(TextDedup.tokens(col(textCol)),
      t => !t.contains(O) && !t.contains(C))
    size(flatten(transform(toks, w => encodeWordCol(w, merges))))
  }

  /**
   * Apply a trained merge table to every document — map-side only.
   * Output: doc_id, n_bpe_tokens, tokens_md5 (md5 of all symbols in
   * document order joined by single spaces — the value-check digest).
   */
  def encodeDocs(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame =
    encodeDocsWith(docs, textCol, idCol, w => encodeWordCol(w, merges))

  /** [[encodeDocs]] over the byte alphabet — identical map-side shape
    * (one projection, `numMerges` codegen'd replaces per word, no
    * shuffle, no driver state at encode time). */
  def encodeDocsBytes(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame =
    encodeDocsWith(docs, textCol, idCol,
      w => encodeWordBytesCol(w, merges))

  /** Per-document PRETOK-BYTE token count under `merges` — the
    * production tokenizer's counts for
    * `SequencePacking.packCounted` (the byte twin of
    * [[tokenCountCol]]). */
  def tokenCountColBytesPretok(textCol: String,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    size(flatten(transform(pretokens(col(textCol)),
      w => encodeWordBytesCol(w, merges))))

  /** [[encodeDocsBytes]] over GPT-2 pretokens — the words differ, the
    * byte seal and the map-side merge fold are shared. */
  def encodeDocsBytesPretok(docs: DataFrame, textCol: String,
      idCol: String, merges: Seq[Merge]): DataFrame =
    encodeDocsWith(docs, textCol, idCol,
      w => encodeWordBytesCol(w, merges),
      words = Some(pretokens(col(textCol))))

  private def encodeDocsWith(docs: DataFrame, textCol: String,
      idCol: String,
      enc: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      words: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val toks = words.getOrElse(
      filter(TextDedup.tokens(col(textCol)),
        t => !t.contains(O) && !t.contains(C)))
    val encs = flatten(transform(toks, enc))
    docs.select(col(idCol).as("doc_id"), encs.as("__e"))
      .select(col("doc_id"),
        size(col("__e")).cast("long").as("n_bpe_tokens"),
        md5(array_join(col("__e"), " ")).as("tokens_md5"))
  }

  /** Persist the trained merge table (train-once/serve-many — the
    * `writeNbModel`/`writeIvfPqIndex` pattern): a single tiny parquet
    * holding (rank, lhs, rhs, pair_count). */
  def writeMerges(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, topK: Int, path: String): Unit =
    trainedMergesDf(spark, docs, textCol, numMerges, topK)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge table in rank order — a ≤ numMerges-row
    * bounded collect. */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path)
      .select("rank", "lhs", "rhs", "pair_count").orderBy("rank")
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  /** [[encodeDocs]] under a persisted model — the stored merges are
    * exactly what the fold applies, so this is bit-identical to
    * encoding with the freshly trained table (same oracle). */
  def encodeFromModel(spark: SparkSession, docs: DataFrame,
      textCol: String, idCol: String, path: String): DataFrame =
    encodeDocs(docs, textCol, idCol, loadMerges(spark, path))

  /** [[writeMerges]] for the byte-level trainer — same tiny (rank,
    * lhs, rhs, pair_count) parquet layout ([[loadMerges]] reads both;
    * the symbols are hex byte pairs instead of characters). */
  def writeByteMerges(spark: SparkSession, docs: DataFrame,
      textCol: String, numMerges: Int, topK: Int, path: String): Unit =
    trainedByteMergesDf(spark, docs, textCol, numMerges, topK)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** [[encodeDocsBytes]] under a persisted byte-merge table —
    * bit-identical to encoding with the freshly trained table. */
  def encodeBytesFromModel(spark: SparkSession, docs: DataFrame,
      textCol: String, idCol: String, path: String): DataFrame =
    encodeDocsBytes(docs, textCol, idCol, loadMerges(spark, path))

  /** The GPT-2 id assignment over a byte-merge table: ids 0–255 are
    * the 256 byte symbols in byte order, id 256+k is merge k's output
    * symbol — deterministic, gap-free, and total (every symbol any
    * encode can produce is either a base byte or a merge output, so id
    * lookup can never miss). This is the vocab file a training run
    * ships; (id, sym) pairs. */
  def byteVocab(merges: Seq[Merge]): Seq[(Long, String)] =
    (0 until 256).map(b => b.toLong -> f"$b%02X") ++
      merges.map(m => (256L + m.rank) -> (m.left + m.right))

  /** [[byteVocab]] as a DataFrame: (id, sym). */
  def byteVocabDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    byteVocab(merges).toDF("id", "sym")
  }

  /** [[encodeDocsBytesPretok]] emitting TOKEN IDS instead of symbol
    * strings — the stream a training run actually consumes: pretokens
    * → byte symbols under the merge fold → [[byteVocab]] ids via a
    * broadcast-literal map (≤ 256 + numMerges entries, map-side, no
    * shuffle). Output: doc_id, n_bpe_tokens, ids_md5 (md5 of the
    * space-joined decimal ids in document order). */
  def encodeDocsBytesPretokIds(docs: DataFrame, textCol: String,
      idCol: String, merges: Seq[Merge]): DataFrame = {
    val symToId = byteVocab(merges).map { case (i, s) => (s, i) }.toMap
    val syms = flatten(transform(pretokens(col(textCol)),
      w => encodeWordBytesCol(w, merges)))
    val ids = transform(syms,
      s => element_at(typedlit(symToId), s).cast("string"))
    docs.select(col(idCol).as("doc_id"),
      size(ids).cast("long").as("n_bpe_tokens"),
      md5(array_join(ids, " ")).as("ids_md5"))
  }

  /** [[writeMerges]] for the pretokenized byte trainer — same tiny
    * parquet layout. */
  def writeBytePretokMerges(spark: SparkSession, docs: DataFrame,
      textCol: String, numMerges: Int, topK: Int, path: String): Unit =
    trainedBytePretokMergesDf(spark, docs, textCol, numMerges, topK)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** [[encodeDocsBytesPretok]] under a persisted merge table —
    * bit-identical to encoding with the freshly trained table. */
  def encodeBytesPretokFromModel(spark: SparkSession, docs: DataFrame,
      textCol: String, idCol: String, path: String): DataFrame =
    encodeDocsBytesPretok(docs, textCol, idCol, loadMerges(spark, path))

  // ------------------------------------------------ oracle SQL emission

  private val oToks =
    raw"""list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"""

  /** RE2 form of [[Gpt2Pretok]]: RE2 has no lookahead, so the
    * whitespace-donates-last-space alternative is DROPPED here (the
    * final `[ \t…]+` absorbs whole runs) and [[oPretoks]] re-applies
    * the donation as a list rewrite — the two-step composition is
    * semantically identical to the Java pattern's backtracking (spec
    * asserts the engine/oracle streams agree token-for-token). Single
    * quotes doubled for embedding in a SQL literal. */
  private val oPretokRe =
    (raw"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+""" +
      raw"""| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+|[ \t\n\x0B\f\r]+""")
      .replace("'", "''")

  private val oWsRun = """^[ \t\n\x0B\f\r]+$"""

  /** DuckDB list expression over `text` producing the GPT-2 pretoken
    * stream: extract with the lookahead-free pattern, then rewrite
    * each interior whitespace run of length ≥ 2 — the run keeps all
    * but its last character; a trailing LITERAL SPACE moves onto the
    * following token (GPT-2's `\s+(?!\S)` backtrack), any other
    * trailing whitespace character stands alone (it cannot attach —
    * the ` ?` in the token alternatives matches only 0x20). */
  private val oPretoks: String = {
    val p0 = s"regexp_extract_all(text, '$oPretokRe')"
    s"""flatten(list_transform($p0, (x, i) ->
      CASE
        WHEN regexp_matches(x, '$oWsRun') AND length(x) >= 2
             AND i < len($p0)
          THEN CASE WHEN x[-1] = ' ' THEN [x[1:-2]]
                    ELSE [x[1:-2], x[-1]] END
        WHEN i > 1 AND regexp_matches(list_extract($p0, i - 1), '$oWsRun')
             AND length(list_extract($p0, i - 1)) >= 2
             AND list_extract($p0, i - 1)[-1] = ' '
          THEN [' ' || x]
        ELSE [x]
      END))"""
  }

  /** The merge-step CTE chain shared by the char- and byte-level
    * oracles (each replaying [[wordSample]] + its trainer): per step k
    * the pair counts (`p{k}`), the argmax merge (`m{k}`) and the
    * rewritten vocab (`v{k}`), plus the `allm(rank, lhs, rhs,
    * pair_count)` union — the learning loop is alphabet-agnostic, only
    * the sealed `v0` differs. */
  private def mergeSteps(numMerges: Int): (String, String) = {
    // v{k} and m{k} are MATERIALIZED: each vocab state is referenced
    // twice (pair counting and the rewrite), so DuckDB's default CTE
    // inlining would expand the chain 2^numMerges times
    val steps = (1 to numMerges).map { k =>
      s"""s$k AS (SELECT freq, string_split(trim(sym, '$O$C'), '$C$O') AS syms FROM v${k - 1}),
p$k AS (SELECT syms[i] AS lhs, syms[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
        FROM s$k, unnest(range(1, len(syms))) AS u(i)
        GROUP BY 1, 2),
m$k AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$k ORDER BY cnt DESC, lhs, rhs LIMIT 1),
v$k AS MATERIALIZED (SELECT word, freq, replace(sym, '$O' || lhs || '$C$O' || rhs || '$C',
                                   '$O' || lhs || rhs || '$C') AS sym
        FROM v${k - 1} CROSS JOIN m$k)"""
    }.mkString(",\n")
    val union = (1 to numMerges)
      .map(k => s"SELECT ${k - 1} AS rank, lhs, rhs, cnt AS pair_count FROM m$k")
      .mkString("\nUNION ALL\n")
    (steps, union)
  }

  /** Char-level seal of SQL expression `e`: one bracketed symbol per
    * character (RE2 `.` — matches everything but \n, which `\s+`
    * already stripped). */
  private def charSealSql(e: String): String =
    s"regexp_replace($e, '(.)', '$O\\1$C', 'g')"

  /** Byte-level seal of SQL expression `e`: `hex(encode(e))` is the
    * UPPERCASE hex of the UTF-8 bytes (DuckDB twin of Spark's
    * `hex(encode(…, 'UTF-8'))` — verified byte-identical), `(..)`
    * brackets each byte's hex pair. */
  private def byteSealSql(e: String): String =
    s"regexp_replace(hex(encode($e)), '(..)', '$O\\1$C', 'g')"

  private def trainCtes(numMerges: Int, topK: Int,
      sealSql: String => String,
      wordsSql: String = oToks): String = {
    val (steps, union) = mergeSteps(numMerges)
    s"""tkx AS (SELECT unnest($wordsSql) AS word FROM documents),
wc AS (SELECT word, count(*) AS freq FROM tkx
       WHERE strpos(word, '$O') = 0 AND strpos(word, '$C') = 0
       GROUP BY word),
ws AS (SELECT word, freq FROM wc ORDER BY freq DESC, word LIMIT $topK),
v0 AS MATERIALIZED (SELECT word, freq,
         ${sealSql("word")} AS sym
       FROM ws),
$steps,
allm AS MATERIALIZED (
$union)"""
  }

  /** Full oracle for the merge-table query. */
  def oracleTrainSql(numMerges: Int, topK: Int): String =
    s"""WITH ${trainCtes(numMerges, topK, charSealSql)}
SELECT rank, lhs, rhs, pair_count FROM allm ORDER BY rank"""

  /** Full oracle for the BYTE-level merge-table query — the same
    * merge-step chain over the byte-sealed `v0`. */
  def oracleByteTrainSql(numMerges: Int, topK: Int): String =
    s"""WITH ${trainCtes(numMerges, topK, byteSealSql)}
SELECT rank, lhs, rhs, pair_count FROM allm ORDER BY rank"""

  /** Full oracle for [[encodeDocs]] under the merges the training CTEs
    * derive: a recursive CTE applies merge rank k at recursion depth k,
    * then per-document symbol counts and the order-preserving digest. */
  /** Training + per-document application CTEs, ending in a relation
    * `agg(doc_id, n, s)` (BPE token count + space-joined symbols) —
    * the shared prefix of the encode and trained-packing oracles. */
  private def encodeCtes(numMerges: Int, topK: Int,
      sealSql: String => String = charSealSql,
      wordsSql: String = oToks): String =
    s"""${trainCtes(numMerges, topK, sealSql, wordsSql)},
dw AS (SELECT doc_id, generate_subscripts(ws2, 1) AS wpos, unnest(ws2) AS word
       FROM (SELECT doc_id,
               list_filter($wordsSql,
                 x -> strpos(x, '$O') = 0 AND strpos(x, '$C') = 0) AS ws2
             FROM documents)),
e(doc_id, wpos, sym, k) AS (
  SELECT doc_id, wpos,
    ${sealSql("word")}, 0
  FROM dw
  UNION ALL
  SELECT e.doc_id, e.wpos,
    replace(sym, '$O' || lhs || '$C$O' || rhs || '$C',
                 '$O' || lhs || rhs || '$C'), k + 1
  FROM e JOIN allm ON allm.rank = e.k),
fin AS (SELECT doc_id, wpos,
          string_split(trim(sym, '$O$C'), '$C$O') AS syms
        -- recursion depth = ACHIEVED merge count: if the trainer
        -- early-stops below numMerges (fully merged vocab), later m{k}
        -- are empty, allm is shorter, and the join chain stops there —
        -- a literal numMerges would select an empty depth
        FROM e WHERE k = (SELECT count(*) FROM allm)),
agg AS (SELECT doc_id,
          CAST(sum(len(syms)) AS BIGINT) AS n,
          string_agg(array_to_string(syms, ' '), ' ' ORDER BY wpos) AS s
        FROM fin GROUP BY doc_id)"""

  def oracleEncodeSql(numMerges: Int, topK: Int): String =
    s"""WITH RECURSIVE ${encodeCtes(numMerges, topK)}
SELECT d.doc_id, coalesce(a.n, 0) AS n_bpe_tokens,
  md5(coalesce(a.s, '')) AS tokens_md5
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""

  /** [[oracleEncodeSql]] over the byte alphabet: training AND the
    * per-document recursive application both seal via UTF-8-byte hex. */
  def oracleByteEncodeSql(numMerges: Int, topK: Int): String =
    s"""WITH RECURSIVE ${encodeCtes(numMerges, topK, byteSealSql)}
SELECT d.doc_id, coalesce(a.n, 0) AS n_bpe_tokens,
  md5(coalesce(a.s, '')) AS tokens_md5
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""

  /** [[oracleByteTrainSql]] over the GPT-2 pretoken stream — the word
    * source swaps ([[oPretoks]]), the sealing and merge chain are
    * shared. */
  def oracleBytePretokTrainSql(numMerges: Int, topK: Int): String =
    s"""WITH ${trainCtes(numMerges, topK, byteSealSql, oPretoks)}
SELECT rank, lhs, rhs, pair_count FROM allm ORDER BY rank"""

  /** [[oracleByteEncodeSql]] over the GPT-2 pretoken stream. */
  def oracleBytePretokEncodeSql(numMerges: Int, topK: Int): String =
    s"""WITH RECURSIVE ${encodeCtes(numMerges, topK, byteSealSql, oPretoks)}
SELECT d.doc_id, coalesce(a.n, 0) AS n_bpe_tokens,
  md5(coalesce(a.s, '')) AS tokens_md5
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""

  /** Oracle for the per-language BYTES-PER-TOKEN compression report:
    * the pretok byte encode chain's per-document counts joined to
    * UTF-8 byte lengths (`strlen` is DuckDB's byte length — the twin
    * of the engine's `octet_length`), the ratio via the repo's exact
    * half-up integer-division idiom. */
  def oracleBytePretokCompressionSql(numMerges: Int, topK: Int): String =
    s"""WITH RECURSIVE ${encodeCtes(numMerges, topK, byteSealSql, oPretoks)},
pt AS (SELECT d.doc_id, d.lang, CAST(strlen(d.text) AS BIGINT) AS b,
         CAST(coalesce(a.n, 0) AS BIGINT) AS t
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
g AS (SELECT lang, CAST(sum(b) AS BIGINT) AS n_bytes,
        CAST(sum(t) AS BIGINT) AS n_tokens
      FROM pt GROUP BY 1)
SELECT lang, n_bytes, n_tokens,
  ((2 * n_bytes * 10000 + n_tokens) // (2 * n_tokens)) / 10000.0
    AS bytes_per_token
FROM g ORDER BY lang"""

  /** [[oraclePackSql]] over the pretokenized byte alphabet — the
    * packing oracle driven by the PRODUCTION tokenizer's counts. */
  def oracleBytePretokPackSql(numMerges: Int, topK: Int,
      budget: Int): String =
    oraclePackSql(numMerges, topK, budget, byteSealSql, oPretoks)

  /** The [[byteVocab]] id-assignment CTEs over a trained `allm`:
    * `vocab(id, sym)` — 256 base byte symbols then merge outputs at
    * 256 + rank. */
  private val vocabCtes: String = """vbase AS (
  SELECT CAST(i AS BIGINT) AS id, upper(lpad(to_hex(i), 2, '0')) AS sym
  FROM range(256) t(i)),
vmerge AS (SELECT CAST(256 + rank AS BIGINT) AS id, lhs || rhs AS sym
           FROM allm),
vocab AS (SELECT * FROM vbase UNION ALL SELECT * FROM vmerge)"""

  /** Oracle for the vocab query: replay the pretok byte training, then
    * the id assignment. */
  def oracleBytePretokVocabSql(numMerges: Int, topK: Int): String =
    s"""WITH ${trainCtes(numMerges, topK, byteSealSql, oPretoks)},
$vocabCtes
SELECT id, sym FROM vocab ORDER BY id"""

  /** Oracle for [[encodeDocsBytesPretokIds]]: the pretok byte encode
    * chain, each symbol joined to its vocab id (total by
    * construction), ids digested in (word, symbol) order. */
  def oracleBytePretokEncodeIdsSql(numMerges: Int, topK: Int): String =
    s"""WITH RECURSIVE ${encodeCtes(numMerges, topK, byteSealSql, oPretoks)},
$vocabCtes,
sy AS (SELECT doc_id, wpos, generate_subscripts(syms, 1) AS sp,
         unnest(syms) AS sym FROM fin),
im AS (SELECT sy.doc_id, sy.wpos, sy.sp, vocab.id
       FROM sy JOIN vocab USING (sym)),
ia AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         md5(string_agg(CAST(id AS VARCHAR), ' ' ORDER BY wpos, sp)) AS h
       FROM im GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n, 0) AS n_bpe_tokens,
  coalesce(a.h, md5('')) AS ids_md5
FROM documents d LEFT JOIN ia a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""

  /** Oracle for `SequencePacking.packCounted` driven by [[tokenCountCol]]
    * (shard = lang): the encode chain's per-document counts feed the
    * per-shard exclusive prefix sum and budget cuts. */
  def oraclePackSql(numMerges: Int, topK: Int, budget: Int,
      sealSql: String => String = charSealSql,
      wordsSql: String = oToks): String =
    s"""WITH RECURSIVE ${encodeCtes(numMerges, topK, sealSql, wordsSql)},
pt AS (SELECT d.doc_id, d.lang AS shard,
         CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
pp AS (SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
       FROM pt)
SELECT doc_id, shard, n_tokens,
  CAST(start_tok // $budget AS BIGINT) AS seq_id,
  CAST(start_tok % $budget AS BIGINT) AS seq_offset,
  start_tok % $budget + n_tokens > $budget AS spans_boundary
FROM pp ORDER BY doc_id"""
}
