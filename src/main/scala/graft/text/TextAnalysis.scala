package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: token counting, quality
 * scoring, heuristic language identification, and document
 * fingerprinting. Pure built-in expressions (codegen'd, pushdown-safe).
 */
object TextAnalysis {

  /** Lowercased whitespace tokens. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), x => x =!= "")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alpha runs, single digits, or single
    * non-alphanumeric marks — a cheap proxy for tokenizer cost. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpePattern))

  /** Punctuation-to-character ratio (0 for empty text). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double") /
        length(c))

  /** Common-English stopwords used by the quality heuristic. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "it", "this")

  /** Fraction of tokens that are stopwords (signal of natural prose). */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0)
      .otherwise(size(array_intersect_count(toks)).cast("double") / size(toks))
  }
  private def array_intersect_count(toks: Column): Column =
    filter(toks, t => t.isInCollection(Stopwords))

  /** Mean token length (0 for empty). */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0), (acc, t) => acc + length(t))
        .cast("double") / size(toks))
  }

  /** The Gopher stop-word presence list (Rae et al. 2021, A1.1): a
    * document must contain at least [[GopherMinStopHits]] of these. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStopHits = 2

  /**
   * The published Gopher corpus-filter rules (Rae et al. 2021,
   * "Scaling Language Models: ...", appendix A1.1 — the rule set
   * C4/MassiveWeb-style pipelines apply before training), emitted as
   * per-document SIGNALS plus the composite verdict so a pipeline can
   * tighten or relax individual bounds:
   *
   *  - word count in [50, 100 000]
   *  - mean word length in [3, 10]
   *  - hash ('#') and ellipsis ('...'/'…') symbol-to-word ratios ≤ 0.1
   *  - ≤ 90% of lines starting with a bullet ('-', '*', '•')
   *  - ≤ 30% of lines ending with an ellipsis
   *  - ≥ 80% of words containing ≥ 1 (ASCII) alphabetic character
   *  - ≥ 2 of the 8 Gopher stop words present
   *
   * Ratios are rounded to 4 decimals BEFORE the threshold compare so
   * the verdict is bit-portable across engines (both Spark and DuckDB
   * round half away from zero); empty/degenerate texts fail closed
   * (coalesce to false). Pure built-ins — one map-side projection.
   */
  def gopherSignals(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = size(toks)
    val nWordsD = nullif(nWords, lit(0)).cast("double")
    val lines = filter(split(t, "\n"), x => trim(x) =!= "")
    val nLines = nullif(size(lines), lit(0)).cast("double")
    val meanLen = round(aggregate(toks, lit(0L), (a, x) => a + length(x))
      .cast("double") / nWordsD, 4)
    val hashRatio = round(regexp_count(t, lit("#")).cast("double") / nWordsD, 4)
    val ellipsisRatio = round(
      (regexp_count(t, lit("\\.\\.\\.")) + regexp_count(t, lit("…")))
        .cast("double") / nWordsD, 4)
    val bulletFrac = round(
      size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") /
        nLines, 4)
    val ellipsisLineFrac = round(
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
        .cast("double") / nLines, 4)
    val alphaFrac = round(
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") / nWordsD, 4)
    val stopHits = size(array_intersect(array_distinct(toks),
      typedlit(GopherStops)))
    docs.select(col(idCol).as("doc_id"),
        nWords.as("n_words"),
        meanLen.as("mean_word_len"),
        hashRatio.as("hash_ratio"),
        ellipsisRatio.as("ellipsis_ratio"),
        bulletFrac.as("bullet_line_frac"),
        ellipsisLineFrac.as("ellipsis_line_frac"),
        alphaFrac.as("alpha_word_frac"),
        stopHits.as("n_stop_hits"))
      .withColumn("gopher_pass", coalesce(
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("hash_ratio") <= 0.1 &&
          col("ellipsis_ratio") <= 0.1 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("n_stop_hits") >= GopherMinStopHits, lit(false)))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, table A1): a doc
    * is removed when the signal EXCEEDS its threshold. Keys: dup-line
    * fraction / dup-line char fraction, top-{2,3,4}-gram char
    * fraction, dup-{5..10}-gram char fraction. */
  val GopherRepThresholds: Map[String, Double] = Map(
    "dup_line_frac" -> 0.30, "dup_line_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16, "dup_5gram_char_frac" -> 0.15,
    "dup_6gram_char_frac" -> 0.14, "dup_7gram_char_frac" -> 0.13,
    "dup_8gram_char_frac" -> 0.12, "dup_9gram_char_frac" -> 0.11,
    "dup_10gram_char_frac" -> 0.10)

  /**
   * The Gopher REPETITION filter table (Rae et al. 2021, A1.1 /
   * table A1) — the other half of [[gopherSignals]]: per-document
   * duplicate-line and n-gram repetition fractions with the paper's
   * removal thresholds. Definitions (documented precisely so the
   * DuckDB oracle and any re-implementation agree):
   *
   *  - tokens are the lowercased whitespace tokens; `total_chars` is
   *    the length of their single-space join (Σ len + (n_toks − 1)).
   *  - n-grams are single-space joins of n consecutive tokens;
   *    occurrences are counted overlapping (the published filters
   *    count match occurrences; overlap handling is unspecified in the
   *    paper — this engine counts every window, documented here).
   *  - `top_Ngram_char_frac` (n = 2..4): count × charlen of the most
   *    frequent n-gram (ties → the longer n-gram; further ties give
   *    the same fraction) over total_chars.
   *  - `dup_Ngram_char_frac` (n = 5..10): Σ over n-gram values seen
   *    more than once of (count − 1) × charlen, over total_chars —
   *    i.e. characters in occurrences beyond the first.
   *  - `dup_line_frac`: line OCCURRENCES beyond the first, over all
   *    line occurrences; `dup_line_char_frac`: same, char-weighted.
   *    Lines are newline-split, trimmed-nonempty.
   *  - `rep_pass`: every signal ≤ its [[GopherRepThresholds]] bound,
   *    on the 4-decimal-rounded values (engine-portable compares).
   *
   * Plan shape: ONE explode of all nine n-gram sizes into (doc, n,
   * gram) rows, one (doc, n, gram) count aggregate, one (doc, n)
   * roll-up (struct-max picks the top gram without a window), then a
   * conditional-aggregation pivot back to one row per document — the
   * same two-level aggregate shape as TF-IDF, fully distributed, no
   * per-doc quadratic expression work.
   */
  def repetitionSignals(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("toks"),
        filter(split(col(textCol), "\n"), x => trim(x) =!= "").as("lines"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("total_chars",
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)) +
          greatest(col("n_toks") - 1, lit(0)).cast("long"))
    // line signals: occurrence- and char-weighted duplicate fractions
    val lineAgg = base.select(col("doc_id"), explode(col("lines")).as("l"))
      .groupBy("doc_id", "l").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("l")).cast("long"))
      .groupBy("doc_id").agg(
        round((sum(col("cnt")) - count(lit(1))).cast("double") /
          sum(col("cnt")), 4).as("dup_line_frac"),
        round(sum((col("cnt") - 1) * col("len")).cast("double") /
          nullif(sum(col("cnt") * col("len")), lit(0L)), 4)
          .as("dup_line_char_frac"))
    // one combined explode of every n-gram size
    val gramArrays = array((2 to 10).map { n =>
      when(col("n_toks") >= n,
        transform(sequence(lit(0), col("n_toks") - n),
          i => struct(lit(n).as("n"),
            concat_ws(" ", slice(col("toks"), i + 1, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    }: _*)
    val counted = base
      .select(col("doc_id"), col("total_chars"),
        explode(flatten(gramArrays)).as("gr"))
      .groupBy(col("doc_id"), col("gr.n").as("n"), col("gr.g").as("g"))
      .agg(count(lit(1)).as("cnt"), first(col("total_chars")).as("tc"))
      .withColumn("charlen", length(col("g")).cast("long"))
    val perN = counted.groupBy("doc_id", "n").agg(
      max(struct(col("cnt"), col("charlen"))).as("top"),
      sum(when(col("cnt") > 1, (col("cnt") - 1) * col("charlen"))
        .otherwise(0L)).as("dupchars"),
      first(col("tc")).as("tc"))
      .select(col("doc_id"), col("n"),
        round((col("top.cnt") * col("top.charlen")).cast("double") /
          nullif(col("tc"), lit(0L)), 4).as("top_frac"),
        round(col("dupchars").cast("double") /
          nullif(col("tc"), lit(0L)), 4).as("dup_frac"))
    val pivoted = perN.groupBy("doc_id").agg(
      max(when(col("n") === 2, col("top_frac"))).as("top_2gram_char_frac"),
      max(when(col("n") === 3, col("top_frac"))).as("top_3gram_char_frac"),
      max(when(col("n") === 4, col("top_frac"))).as("top_4gram_char_frac"),
      max(when(col("n") === 5, col("dup_frac"))).as("dup_5gram_char_frac"),
      max(when(col("n") === 6, col("dup_frac"))).as("dup_6gram_char_frac"),
      max(when(col("n") === 7, col("dup_frac"))).as("dup_7gram_char_frac"),
      max(when(col("n") === 8, col("dup_frac"))).as("dup_8gram_char_frac"),
      max(when(col("n") === 9, col("dup_frac"))).as("dup_9gram_char_frac"),
      max(when(col("n") === 10, col("dup_frac"))).as("dup_10gram_char_frac"))
    val sigCols = RepSignalCols
    val joined = base.select("doc_id")
      .join(lineAgg, Seq("doc_id"), "left")
      .join(pivoted, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        sigCols.map(c => coalesce(col(c), lit(0.0)).as(c)): _*)
    joined.withColumn("rep_pass",
      sigCols.map(c => col(c) <= GopherRepThresholds(c)).reduce(_ && _))
  }

  /** Column order of [[repetitionSignals]]' signal outputs — shared by
    * the kernel unpack so the two formulations cannot drift. */
  val RepSignalCols: Seq[String] = Seq("dup_line_frac",
    "dup_line_char_frac", "top_2gram_char_frac", "top_3gram_char_frac",
    "top_4gram_char_frac", "dup_5gram_char_frac", "dup_6gram_char_frac",
    "dup_7gram_char_frac", "dup_8gram_char_frac", "dup_9gram_char_frac",
    "dup_10gram_char_frac")

  /**
   * MAP-SIDE form of [[repetitionSignals]]: every signal is
   * per-document, so one codegen'd kernel call
   * ([[graft.functions.VectorAdapters.gopherRepetition]]) computes all
   * 11 fractions with ZERO shuffle — the compositional explode plan
   * moves ~9× the token count in gram strings through an exchange;
   * this moves nothing off the scan task. Output is bit-identical to
   * [[repetitionSignals]] (spec-asserted over the test corpus); this
   * is the registered default, the compositional form is the
   * plan-shape twin.
   */
  def repetitionSignalsKernel(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    // two Projects on purpose: the kernel array is referenced 11 times,
    // and CollapseProject keeps non-cheap multi-referenced expressions
    // in their own Project, so the kernel runs ONCE per row
    docs.select(col(idCol).as("doc_id"),
        graft.functions.GraftFunctions.gopher_repetition(col(textCol))
          .as("sig"))
      .select(col("doc_id") +:
        RepSignalCols.zipWithIndex.map { case (c, i) =>
          element_at(col("sig"), i + 1).as(c)
        }: _*)
      .withColumn("rep_pass",
        RepSignalCols.map(c => col(c) <= GopherRepThresholds(c))
          .reduce(_ && _))

  /**
   * Composite quality score in [0,1]: rewards texts in a reasonable
   * length band, with some stopword usage and sane word lengths, and
   * penalizes punctuation soup — the shape of the reference's validity
   * heuristics (clean_commoncrawl.py length bounds) extended to a
   * graded score. Rounded to 4 decimals.
   */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 200.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    val wordScore = when(meanTokenLen(c).between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctPenalty = least(punctRatio(c) * 5.0, lit(1.0))
    round((lenScore * 0.3 + stopScore * 0.3 + wordScore * 0.4) *
      (lit(1.0) - punctPenalty * 0.5), 4)
  }

  /** Marker words per language for the n-gram/keyword language-ID
    * heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))

  /** Heuristic language ID: the language whose marker words cover the
    * most tokens; ties resolve in LangMarkers order; no hits → "und". */
  def languageId(c: Column): Column = {
    val toks = tokens(c)
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isInCollection(markers))).as("hits"),
        lit(LangMarkers.size - LangMarkers.indexWhere(_._1 == lang)).as("prio"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Document fingerprint: md5 of the sorted distinct token set — a
    * canonical-form digest that collides exactly for bag-of-words
    * duplicates (word-order/duplication-insensitive). */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " "))

  // ------------------------------------------------------- PII redaction

  /** Conservative PII patterns, restricted to regex features with
    * identical semantics in Java regex (Spark codegen) and RE2 (DuckDB
    * oracle): character classes, bounded repetition, \b. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b(\d{1,3}\.){3}\d{1,3}\b"""
  val PhoneRe = """\+\d{2} \d{3} \d{3} \d{3}"""

  /** Scrub emails, IPv4 addresses and international-format phone numbers
    * from a text column — the privacy pass a training-data pipeline runs
    * before publishing a corpus. Map-only (three codegen'd
    * regexp_replace), order fixed email → ip → phone. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII hit counts plus the digest of the redacted text
    * (digest instead of the full text: verifies every replacement without
    * shipping wide strings through the comparison). */
  def piiReport(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).as("n_ips"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"),
      md5(redactPii(col(textCol))).as("redacted_md5"))

  /** Corpus-level token statistics per group column — the scale numbers
    * (docs, chars, whitespace + BPE-ish tokens, mean doc length) a
    * training run reports per language/source. One aggregation pass. */
  def corpusStats(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("total_chars"),
        sum(tokenCount(col(textCol))).as("total_tokens"),
        sum(bpeTokenCount(col(textCol))).as("total_bpe_tokens"))
      // exact integer sum ÷ exact count: one IEEE division, portable
      // without rounding
      .withColumn("mean_doc_tokens",
        col("total_tokens").cast("double") / col("n_docs"))

  /**
   * C4 line-level cleaning (Raffel et al. 2020 §2.2) — the classic
   * within-document boilerplate pass that runs BEFORE document-level
   * quality filters: keep only lines that end in a terminal punctuation
   * mark, contain at least `minLineWords` words, and do not mention
   * "javascript"; then gate the PAGE — drop documents whose cleaned
   * text has fewer than `minSentences` sentences (terminal-punctuation
   * count) or whose ORIGINAL text contains "lorem ipsum" or a curly
   * brace (code/boilerplate markers). Everything is array/regex ops in
   * one map-side projection — no shuffle, no UDF — and every rule is
   * replayed by the DuckDB oracle.
   *
   * Output: doc_id, clean_md5 (digest of the kept-lines text — keeps
   * verify rows small, like normalize_documents), n_lines,
   * n_kept_lines, n_sentences, kept.
   */
  def c4LineFilter(docs: DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 3, minSentences: Int = 5): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keptLines = filter(lines, l => {
      val t = trim(l)
      val words = size(filter(split(t, "\\s+"), w => w =!= ""))
      // \z, not $: Java's $ also matches before a final line terminator
      // (\r, U+2028, U+2029 — which trim() does NOT strip), so a CRLF
      // document's "foo.\r" line would pass here while the oracle's RE2
      // $ (end-of-string only) drops it. \z anchors both engines alike.
      t.rlike("[.!?\"]\\z") && words >= minLineWords &&
        !lower(t).contains("javascript")
    })
    val cleanText = array_join(keptLines, "\n")
    val sentences =
      (length(cleanText) -
        length(regexp_replace(cleanText, "[.!?]", ""))).cast("long")
    docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__t"), lines.as("__lines"),
        keptLines.as("__kept"), cleanText.as("__clean"),
        sentences.as("n_sentences"))
      .select(col("doc_id"),
        md5(col("__clean")).as("clean_md5"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept_lines"),
        col("n_sentences"),
        (col("n_sentences") >= minSentences &&
          !lower(col("__t")).contains("lorem ipsum") &&
          !col("__t").contains("{")).as("kept"))
  }

  /** Full analysis projection over a document frame. */
  def analyze(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeTokenCount(col(textCol)).as("n_bpe_tokens"),
      round(punctRatio(col(textCol)), 4).as("punct_ratio"),
      round(stopwordRatio(col(textCol)), 4).as("stopword_ratio"),
      qualityScore(col(textCol)).as("quality_score"),
      languageId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprint"),
      graft.functions.GraftFunctions.rolling_hash(col(textCol))
        .as("rolling_fp"))
}
