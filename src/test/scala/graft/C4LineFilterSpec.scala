package graft

import graft.text.TextAnalysis

/** C4 line-level cleaning: planted violations for every line rule and
  * every page gate. */
class C4LineFilterSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextAnalysis.c4LineFilter(rows.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("line rules: terminal punctuation, min words, javascript") {
    val doc = Seq(
      "this line ends with a period.",   // kept
      "no terminal punctuation here",    // dropped: no [.!?\"]
      "two words.",                      // dropped: < 3 words
      "this javascript line is styled.", // dropped: mentions javascript
      "does this end with a question?",  // kept
      "quoted line ends with a quote.\"" // kept
    ).mkString("\n")
    val out = run(Seq((1L, doc)))
    val (cleanMd5, nLines, nKept, nSent, kept) = out(1L)
    assert(nLines == 6 && nKept == 3)
    val expectClean = Seq("this line ends with a period.",
      "does this end with a question?",
      "quoted line ends with a quote.\"").mkString("\n")
    assert(cleanMd5 == md5(expectClean))
    // sentences in CLEAN text: 1 period + 1 question + 1 period = 3 < 5
    assert(nSent == 3 && !kept)
  }

  test("page gates: lorem ipsum, curly brace, min sentences") {
    val good = (1 to 6).map(i => s"sentence number $i is fine.").mkString("\n")
    val lorem = good + "\nthis page has Lorem Ipsum in it."
    val brace = good + "\nvar x = { javascriptless } here."
    val short = "only one good sentence here."
    val out = run(Seq((1L, good), (2L, lorem), (3L, brace), (4L, short)))
    assert(out(1L)._5, "clean page must be kept")
    assert(!out(2L)._5, "lorem ipsum page must drop (case-insensitive)")
    assert(!out(3L)._5, "brace page must drop")
    assert(!out(4L)._5, "page below 5 sentences must drop")
    // the gate is PAGE level: lorem/brace lines can still be kept LINES
    assert(out(2L)._3 == 7)
  }

  test("empty and whitespace-only documents are defined and dropped") {
    val out = run(Seq((1L, ""), (2L, "   \n  ")))
    assert(!out(1L)._5 && !out(2L)._5)
    assert(out(1L)._3 == 0 && out(2L)._3 == 0)
  }
}
