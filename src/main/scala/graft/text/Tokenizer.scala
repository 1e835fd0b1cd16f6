package graft.text

/**
 * Vocab-driven wordpiece tokenizer — greedy longest-match subword
 * segmentation (the WordPiece inference algorithm: lowercase, split on
 * non-alphanumeric runs, then per word repeatedly take the LONGEST vocab
 * piece matching at the cursor, continuation pieces carrying a "##"
 * prefix). This is what turns "token counts" in packing/chunking from a
 * whitespace proxy into the counts a trainer's tokenizer actually
 * produces.
 *
 * Design notes:
 *  - The vocab is a plain literal ([[Vocab]]); segmentation is a pure
 *    function of (text, vocab), bit-reproducible everywhere. The same
 *    object emits the DuckDB oracle SQL ([[oracleSegCtes]]) so engine
 *    and oracle share ONE vocabulary definition.
 *  - Unknown characters produce a single `[UNK]` that consumes the REST
 *    of the word (documented library semantics; with single-character
 *    fallback pieces in the vocab this only triggers on characters
 *    outside [a-z0-9], which the pre-tokenizer already strips).
 *  - Scale shape: map-side only — one codegen'd kernel call per row
 *    (StaticInvoke, see GraftFunctions.wordpiece_tokens), no shuffle,
 *    no driver state. Vocab lookup is an O(1) hash probe per attempted
 *    length, lengths bounded by the longest piece.
 */
object Tokenizer {

  val Unk = "[UNK]"

  /** A wordpiece vocabulary: word-start pieces plain, continuation
    * pieces "##"-prefixed. Lookup tables are grouped by matched-substring
    * length so greedy matching probes longest-first. */
  final case class Vocab(pieces: Seq[String]) {
    val startByLen: Map[Int, Set[String]] = pieces
      .filterNot(_.startsWith("##")).groupBy(_.length)
      .map { case (k, v) => k -> v.toSet }
    val contByLen: Map[Int, Set[String]] = pieces
      .filter(_.startsWith("##")).map(_.drop(2)).groupBy(_.length)
      .map { case (k, v) => k -> v.toSet }
    val maxStartLen: Int = if (startByLen.isEmpty) 0 else startByLen.keys.max
    val maxContLen: Int = if (contByLen.isEmpty) 0 else contByLen.keys.max
  }

  /** Demo vocabulary over the synthetic `documents` corpus: full words
    * for most of its closed vocabulary, genuine subword splits for six
    * words (cust·##omer, col·##umn, fil·##ter, vec·##tor, str·##eam,
    * win·##dow), and single-character fallbacks so any [a-z0-9] word
    * segments without [UNK]. */
  val DemoVocab: Vocab = {
    val words5 = Seq("small", "merge", "order", "table", "value", "group",
      "query", "spark", "batch")
    val words4 = Seq("join", "hash", "scan", "slow", "line", "data",
      "part", "sort", "fast", "cust")
    val words3 = Seq("row", "agg", "key", "big", "the", "dup", "col",
      "fil", "vec", "str", "win")
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val cont = Seq("omer", "umn", "ter", "tor", "eam", "dow") ++ chars
    Vocab(words5 ++ words4 ++ words3 ++ chars ++ cont.map("##" + _))
  }

  /** Parse a wordpiece vocabulary file — the standard `vocab.txt`
    * layout: one piece per line, continuation pieces "##"-prefixed.
    * Blank lines and bracketed special tokens ([CLS], [SEP], [PAD], …)
    * are dropped: the [a-z0-9]+ pre-tokenizer can never produce them,
    * so keeping them would only pollute the length tables. A real ~30k
    * BERT-style vocab parses into the same length-bucketed hash tables
    * as [[DemoVocab]] — greedy matching stays O(maxPieceLen) hash
    * probes per cursor position regardless of vocab size. */
  def loadVocab(path: java.nio.file.Path): Vocab = {
    val lines = java.nio.file.Files.readAllLines(path,
      java.nio.charset.StandardCharsets.UTF_8)
    import scala.jdk.CollectionConverters._
    Vocab(lines.asScala.iterator.map(_.trim)
      .filter(p => p.nonEmpty && !(p.startsWith("[") && p.endsWith("]")))
      .toSeq)
  }

  /** Greedy longest-match segmentation of one pre-token. */
  def wordPieces(word: String, v: Vocab = DemoVocab): List[String] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val (table, maxLen) =
        if (pos == 0) (v.startByLen, v.maxStartLen)
        else (v.contByLen, v.maxContLen)
      var l = math.min(maxLen, word.length - pos)
      var found = 0
      while (l >= 1 && found == 0) {
        if (table.getOrElse(l, Set.empty).contains(word.substring(pos, pos + l)))
          found = l
        l -= 1
      }
      if (found == 0) { out += Unk; pos = word.length }
      else {
        val sub = word.substring(pos, pos + found)
        out += (if (pos == 0) sub else "##" + sub)
        pos += found
      }
    }
    out.result()
  }

  private val preTokenRe = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** Full-text tokenization: lowercase, [a-z0-9]+ pre-tokens, greedy
    * wordpiece per pre-token. Null/empty-safe (empty array). */
  def tokenize(text: String, v: Vocab = DemoVocab): Array[String] = {
    if (text == null) return Array.empty
    val m = preTokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = Array.newBuilder[String]
    while (m.find()) out ++= wordPieces(m.group(), v)
    out.result()
  }

  // ------------------------------------------------ oracle SQL emission

  // Single quotes doubled per the SQL standard: DemoVocab is [a-z0-9]
  // only, but a caller-supplied vocab containing a quote must produce a
  // well-formed literal, not malformed/injected oracle SQL.
  private def sqlList(items: Iterable[String]): String =
    items.toSeq.sorted
      .map(s => s"'${s.replace("'", "''")}'").mkString("[", ",", "]")

  private def greedyCase(byLen: Map[Int, Set[String]]): String =
    byLen.keys.toSeq.sorted.reverse.map { l =>
      s"WHEN list_contains(${sqlList(byLen(l))}, substr(word,pos,$l)) THEN $l"
    }.mkString("CASE ", "\n             ", "\n             ELSE 0 END")

  /**
   * DuckDB CTEs segmenting `docsTable`(doc_id, text) with THIS vocab's
   * greedy longest-match — `seg` holds (doc_id, wpos, word, pos, piece,
   * ord); filter `piece IS NOT NULL` for emitted pieces. Generated from
   * the same [[Vocab]] the engine kernel uses.
   */
  def oracleSegCtes(v: Vocab, docsTable: String = "documents"): String =
    s"""w AS (SELECT doc_id, generate_subscripts(ws,1) AS wpos, unnest(ws) AS word
      FROM (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') AS ws
            FROM $docsTable)),
seg(doc_id, wpos, word, pos, piece, ord) AS (
  SELECT doc_id, wpos, word, 1, CAST(NULL AS VARCHAR), 0 FROM w
  UNION ALL
  SELECT doc_id, wpos, word,
    CASE WHEN plen = 0 THEN length(word) + 1 ELSE pos + plen END,
    CASE WHEN plen = 0 THEN '$Unk'
         WHEN pos = 1 THEN substr(word, pos, plen)
         ELSE '##' || substr(word, pos, plen) END,
    ord + 1
  FROM (
    SELECT *, CASE WHEN pos = 1 THEN ${greedyCase(v.startByLen)}
      ELSE ${greedyCase(v.contByLen)}
      END AS plen
    FROM seg WHERE pos <= length(word)) t)"""
}
