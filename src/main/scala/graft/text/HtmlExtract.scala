package graft.text

/**
 * Rule-based HTML main-content extraction — the boilerplate-removal
 * step between a WARC crawl and the text pipeline (jusText /
 * trafilatura semantics re-expressed as deterministic integer/ratio
 * rules; Pomikálek 2011 for the block-classification idea). The WET
 * ingest path ships pre-extracted text; real training-data pipelines
 * start from WARC HTML, and this kernel completes that story
 * (`spark.read.format("warc")` → [[graft.functions.GraftFunctions.html_main_text]]).
 *
 * Algorithm (single pass, constant state — no DOM):
 *
 *  1. `<script>`/`<style>` elements and `<!-- -->` comments are dropped
 *     wholesale (their text is never content).
 *  2. The tag stream segments text into BLOCKS at block-level tags
 *     (`p div h1..h6 li ul ol table tr td th blockquote pre br
 *     section article main body html head title form` — open or
 *     close); inline tags (`a b i em strong span code u small sub sup`)
 *     do not break a block.
 *  3. Per block the kernel tracks: text (entities decoded, whitespace
 *     runs collapsed to single spaces), characters inside `<a>`
 *     elements (link chars), word count, stopword count
 *     ([[TextAnalysis.Stopwords]]), and whether any character was
 *     emitted inside a `nav/footer/header/aside` container.
 *  4. A block is BOILERPLATE if any rule fires:
 *       - it sits (even partially) inside a nav/footer/header/aside;
 *       - link density (link chars / text chars) > `maxLinkDensity`;
 *       - word count < `minWords`;
 *       - stopword density < `minStopRatio` (default 0.0 = gate off —
 *         the jusText stopword gate, opt-in because it is
 *         language-bound).
 *  5. Main content = surviving blocks joined by `\n`, in order.
 *
 * Malformed HTML degrades instead of failing (the WET scan's
 * truncation discipline): an unterminated tag swallows to end of
 * input, unknown tags are treated as inline, stray `>` is text, and
 * unbalanced close tags clamp depth counters at zero.
 */
object HtmlExtract extends Serializable {

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "br", "section",
    "article", "main", "body", "html", "head", "title", "form",
    "nav", "footer", "header", "aside")

  private val BadContainers: Set[String] = Set(
    "nav", "footer", "header", "aside")

  private val DropElements: Set[String] = Set("script", "style")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "#39" -> "'", "nbsp" -> " ")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Case-insensitive indexOf without allocating a lowercased copy of
    * the document. `String.toLowerCase` is locale-sensitive and can
    * CHANGE LENGTH even in the root locale (U+0130 'İ' lowercases to
    * two chars), so an index found in a lowercased copy does not
    * reliably address the original string — on multilingual pages the
    * parser would resume inside a script body. regionMatches(true, …)
    * compares char-by-char in place: indices always refer to `s`, and
    * no O(n) copy is allocated per script/style element. */
  private def indexOfIgnoreCase(s: String, target: String,
      from: Int): Int = {
    val last = s.length - target.length
    var i = math.max(from, 0)
    while (i <= last) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** One extracted block with its classification evidence. */
  final case class Block(text: String, linkChars: Int, words: Int,
      stopwords: Int, inBadContainer: Boolean) {
    def linkDensity: Double =
      if (text.isEmpty) 0.0 else linkChars.toDouble / text.length
    def stopRatio: Double =
      if (words == 0) 0.0 else stopwords.toDouble / words
  }

  /** Tokenize `html` into classified blocks (the full evidence frame —
    * [[mainContent]] keeps the survivors). */
  def blocks(html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val sb = new StringBuilder
    var linkChars = 0
    var anchorDepth = 0
    var badDepth = 0
    var blockBad = false
    var pendingSpace = false

    def flush(): Unit = {
      val text = sb.toString
      if (text.nonEmpty) {
        var words = 0; var stops = 0
        var i = 0
        while (i < text.length) {
          var j = i
          while (j < text.length && text.charAt(j) != ' ') j += 1
          if (j > i) {
            words += 1
            if (TextAnalysis.Stopwords.contains(
                text.substring(i, j)
                  .toLowerCase(java.util.Locale.ROOT))) stops += 1
          }
          i = j + 1
        }
        out += Block(text, math.min(linkChars, text.length), words, stops,
          blockBad)
      }
      sb.clear(); linkChars = 0
      // a bad container is itself a block tag, so no block straddles
      // its boundary — the flag re-arms purely from emits
      blockBad = false
      pendingSpace = false
    }

    def emit(c: Char): Unit = {
      if (isWs(c)) { if (sb.nonEmpty) pendingSpace = true }
      else {
        if (pendingSpace) {
          sb.append(' ')
          if (anchorDepth > 0) linkChars += 1
          pendingSpace = false
        }
        sb.append(c)
        if (anchorDepth > 0) linkChars += 1
        if (badDepth > 0) blockBad = true
      }
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          if (end < 0) { i = n } // unterminated tag swallows the tail
          else {
            val inner = html.substring(i + 1, end).trim
            val closing = inner.startsWith("/")
            val nameRaw = (if (closing) inner.drop(1) else inner)
              .takeWhile(ch => !isWs(ch) && ch != '/')
            // Locale.ROOT: under a Turkish default locale 'DIV'
            // lowercases to 'dıv' (dotless ı) and uppercase tags stop
            // matching the ASCII tag sets
            val name = nameRaw.toLowerCase(java.util.Locale.ROOT)
            if (!closing && DropElements.contains(name) &&
                !inner.endsWith("/")) {
              // skip to the matching close tag (first occurrence — no
              // nesting of script/style in valid HTML); in-place
              // case-insensitive scan so the index addresses `html`
              val close = indexOfIgnoreCase(html, s"</$name", end + 1)
              if (close < 0) i = n
              else i = math.max(html.indexOf('>', close) + 1, close)
            } else {
              if (BlockTags.contains(name)) flush()
              if (name == "a") {
                if (closing) anchorDepth = math.max(0, anchorDepth - 1)
                else if (!inner.endsWith("/")) anchorDepth += 1
              }
              if (BadContainers.contains(name)) {
                if (closing) badDepth = math.max(0, badDepth - 1)
                else if (!inner.endsWith("/")) badDepth += 1
              }
              i = end + 1
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val name = if (semi > 0 && semi - i <= 8)
          html.substring(i + 1, semi) else null
        Entities.get(if (name == null) ""
          else name.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(rep) => rep.foreach(emit); i = semi + 1
          case None => emit(c); i += 1
        }
      } else { emit(c); i += 1 }
    }
    flush()
    out.toSeq
  }

  /** The main-content text of one HTML document — surviving blocks
    * joined by `\n` (the kernel behind `html_main_text`). */
  def mainContent(html: String, minWords: Int,
      maxLinkDensity: Double, minStopRatio: Double): String =
    blocks(html).iterator
      .filter(b => !b.inBadContainer &&
        b.words >= minWords &&
        b.linkDensity <= maxLinkDensity &&
        b.stopRatio >= minStopRatio)
      .map(_.text)
      .mkString("\n")
}
