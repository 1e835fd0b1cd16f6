package graft

import graft.functions.{GraftFunctions => G, Text}
import org.apache.spark.sql.functions._

/** Mirrors the reference's tests/test_parsing.py over the native
  * expression library. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).first().get(0)

  test("normalize_text: NFC unification, whitespace collapse, idempotence") {
    import graft.functions.GraftFunctions.normalize_text
    import org.apache.spark.sql.functions.lit
    def norm(s: String): String =
      one(normalize_text(lit(s))).asInstanceOf[String]
    // composed é (U+00E9) and decomposed e+U+0301 normalize identically
    assert(norm("Café") == norm("Café"))
    assert(norm("Café") == "café")
    // ASCII \s runs collapse to single spaces; ends trimmed
    assert(norm("  A \t\n B C\f ") == "a b c")
    assert(norm("") == "" && norm("   ") == "")
    // idempotent: a normalized string is its own normalization
    val s0 = norm("  Träumerei  im   Schnee ")
    assert(norm(s0) == s0)
    // null propagates
    assert(one(normalize_text(lit(null).cast("string"))) == null)
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT normalize_text('  Grand   PIANO ') AS n")
      .first().getString(0) == "grand piano")
  }

  test("normalizeName (test_parsing.py:22-45)") {
    val cases = Seq(
      "ACME Pty Ltd" -> "ACME",
      "ACME Corporation Pty Ltd" -> "ACME",
      "ACME Australia" -> "ACME",
      "ABC & Sons Australia Limited" -> "ABC SONS",
      // note: reference's test_parsing.py:44 expects "ACME CORPORATION" but
      // its own implementation strips the CORPORATION stopword — the
      // implementation (utils.py:43-86) is authoritative.
      "acme corporation" -> "ACME",
      "A.C.M.E. Pty. Ltd." -> "A C M E",
      "" -> "")
    val df = cases.map(_._1).toDF("name")
      .select(Text.normalizeName($"name").as("n"))
    assert(df.as[String].collect().toSeq == cases.map(_._2))
    // null → ""
    assert(one(Text.normalizeName(lit(null).cast("string"))) == "")
  }

  test("abn_valid expression incl. codegen path (test_parsing.py:48-67)") {
    val df = Seq(
      ("51824753556", true),
      ("51 824 753 556", true),
      ("51824753557", false),
      ("5182475355", false),
      ("518247535567", false),
      ("", false),
      (null.asInstanceOf[String], false))
      .toDF("abn", "want")
    val got = df.select(G.abn_valid($"abn").as("got"), $"want")
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
    // also usable from SQL after registration
    G.register(spark)
    assert(spark.sql("SELECT abn_valid('51824753556')").first().getBoolean(0))
  }

  test("formatAbn / cleanAbn (test_parsing.py:70-82)") {
    assert(one(Text.formatAbn(lit("51824753556"))) == "51 824 753 556")
    assert(one(Text.formatAbn(lit("51 824 753 556"))) == "51 824 753 556")
    assert(one(Text.formatAbn(lit("123"))) == "123")
    assert(one(Text.cleanAbn(lit("51-824-753-556"))) == "51824753556")
    assert(one(Text.cleanAbn(lit("123"))) == null)
  }

  test("extractDomain / isAustralianDomain (test_parsing.py:85-118)") {
    assert(one(Text.extractDomain(lit("https://www.acme.com.au/about"))) == "acme.com.au")
    assert(one(Text.extractDomain(lit("http://techcorp.com.au"))) == "techcorp.com.au")
    assert(one(Text.extractDomain(lit("not a url"))) == "")
    assert(one(Text.isAustralianDomain(lit("https://acme.com.au"))) == true)
    assert(one(Text.isAustralianDomain(lit("https://acme.org.au/x"))) == true)
    assert(one(Text.isAustralianDomain(lit("https://acme.com"))) == false)
  }

  test("cleanText strips tags, urls, emails (test_parsing.py:121-142)") {
    assert(one(Text.cleanText(lit("Hello <b>world</b>"))) == "Hello world")
    assert(one(Text.cleanText(lit("Visit https://x.com now"))) == "Visit now")
    assert(one(Text.cleanText(lit("mail me@x.com ok"))) == "mail ok")
    assert(one(Text.cleanText(lit("a   b\t\nc"))) == "a b c")
  }

  test("blockKey (utils.py:164-180)") {
    assert(one(Text.blockKey(lit("ACME"))) == "acme")
    assert(one(Text.blockKey(lit("AB"))) == "ab")
    assert(one(Text.blockKey(lit("GREEN ENERGY PARTNERS"))) == "gree")
  }

  test("extractCompanyFromText patterns (utils.py:183-212)") {
    // pattern 1 starts at any capital letter, so "Welcome to" is included —
    // verified against the Python regex behavior.
    assert(one(Text.extractCompanyFromText(
      lit("Welcome to Acme Corporation Pty Ltd, leaders in widgets")))
      == "Welcome to Acme Corporation Pty Ltd")
    assert(one(Text.extractCompanyFromText(lit("About TechCorp Solutions here")))
      == "TechCorp Solutions here")
    assert(one(Text.extractCompanyFromText(lit("no company mentioned"))) == null)
  }

  test("extractIndustryFromText (utils.py:215-243)") {
    assert(one(Text.extractIndustryFromText(lit("Industry: Mining and stuff")))
      == "Mining and stuff")
    assert(one(Text.extractIndustryFromText(lit("We specialize in software development")))
      == "software development")
    assert(one(Text.extractIndustryFromText(lit("nothing here"))) == null)
  }

  test("cleanCompanyName noise strip + length guard (clean_commoncrawl.py:80-115)") {
    assert(one(Text.cleanCompanyName(lit("Welcome to  Acme Corp"))) == "Acme Corp")
    assert(one(Text.cleanCompanyName(lit("Acme | Official Site"))) == "Acme")
    assert(one(Text.cleanCompanyName(lit("A"))) == null)
    assert(one(Text.cleanCompanyName(lit(null).cast("string"))) == null)
  }

  test("cleanIndustry mapping (clean_commoncrawl.py:118-162)") {
    assert(one(Text.cleanIndustry(lit("software development"))) == "Information Technology")
    assert(one(Text.cleanIndustry(lit("Industry: banking"))) == "Financial Services")
    assert(one(Text.cleanIndustry(lit("underwater basket weaving")))
      == "Underwater Basket Weaving")
    assert(one(Text.cleanIndustry(lit(null).cast("string"))) == null)
  }

  test("cleanEntityName title-cases all-caps, keeps acronyms (clean_abr.py:133-160)") {
    assert(one(Text.cleanEntityName(lit("ACME HOLDINGS PTY LTD"))) == "Acme Holdings PTY LTD")
    assert(one(Text.cleanEntityName(lit("Acme Holdings"))) == "Acme Holdings")
    assert(one(Text.cleanEntityName(lit("SMITH FAMILY AS TRUSTEE FOR THE SMITH TRUST")))
      == "Smith Family")
  }

  test("cleanEntityType / cleanStatus / cleanState / cleanPostcode (clean_abr.py)") {
    assert(one(Text.cleanEntityType(lit("prv"))) == "Private Company")
    assert(one(Text.cleanEntityType(lit("XYZ"))) == "XYZ")
    assert(one(Text.cleanStatus(lit("ACTIVE"))) == "Active")
    assert(one(Text.cleanStatus(lit("Deregistered"))) == "Active") // reference quirk
    assert(one(Text.cleanStatus(lit("cancelled"))) == "Cancelled")
    assert(one(Text.cleanStatus(lit("pending"))) == "Pending")
    assert(one(Text.cleanState(lit("New South Wales"))) == "NSW")
    assert(one(Text.cleanState(lit("vic"))) == "VIC")
    assert(one(Text.cleanState(lit("Narnia"))) == null)
    assert(one(Text.cleanPostcode(lit("NSW 2000"))) == "2000")
    assert(one(Text.cleanPostcode(lit("no digits"))) == null)
  }

  test("parseDateMulti formats (parse_abr.py:219-240)") {
    val d = java.sql.Date.valueOf("2020-01-31")
    assert(one(Text.parseDateMulti(lit("20200131"))) == d)
    assert(one(Text.parseDateMulti(lit("2020-01-31"))) == d)
    assert(one(Text.parseDateMulti(lit("31/01/2020"))) == d)
    assert(one(Text.parseDateMulti(lit("2020/01/31"))) == d)
    assert(one(Text.parseDateMulti(lit("31-01-2020"))) == d)
    assert(one(Text.parseDateMulti(lit("garbage"))) == null)
  }

  test("token_sort_ratio column matches kernel; null-safe") {
    val df = Seq(("CONTACT", "CONTRACTA"), ("ACME", "ACME")).toDF("a", "b")
    val rows = df.select(G.token_sort_ratio($"a", $"b")).as[Double].collect()
    assert(math.abs(rows(0) - 0.875) < 1e-9)
    assert(rows(1) == 1.0)
  }

  test("jaccardTokens column (entity_match.py:236-250)") {
    val got = spark.range(1)
      .select(Text.jaccardTokens(lit("green energy partners"), lit("GREEN energy")))
      .as[Double].first()
    assert(math.abs(got - 2.0 / 3.0) < 1e-12)
  }

  test("repetitionSignals: planted repetition fails; hand-computed 2-gram value") {
    import graft.text.TextAnalysis
    val varied = (1 to 80).map(i => s"w$i").mkString(" ")     // all distinct
    val tenGram = "one two three four five six seven eight nine ten"
    val docs = Seq(
      0L -> varied,                                            // passes
      1L -> Seq.fill(6)(tenGram).mkString(" "),                // dup 5..10-grams
      2L -> Seq.fill(40)("ping pong").mkString(" "),           // top 2-gram soup
      3L -> (Seq.fill(5)("same line here") ++ Seq("unique tail line"))
        .mkString("\n"),                                       // dup lines
      4L -> "a b a b a b"                                      // exact value below
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("rep_pass"), "varied doc must pass")
    assert(!got(1L).getAs[Boolean]("rep_pass"))
    assert(got(1L).getAs[Double]("dup_10gram_char_frac") > 0.10)
    assert(!got(2L).getAs[Boolean]("rep_pass"))
    assert(got(2L).getAs[Double]("top_2gram_char_frac") > 0.20)
    assert(!got(3L).getAs[Boolean]("rep_pass"))
    assert(got(3L).getAs[Double]("dup_line_frac") > 0.30)
    assert(got(3L).getAs[Double]("dup_line_char_frac") > 0.20)
    // "a b a b a b": 6 tokens, total_chars = 6 + 5 = 11; overlapping
    // 2-grams: "a b"×3 (len 3), "b a"×2 → top frac = 3·3/11 = 0.8182
    assert(got(4L).getAs[Double]("top_2gram_char_frac") == 0.8182)
  }

  test("repetition kernel is row-identical to the explode/aggregate form") {
    import graft.text.TextAnalysis
    val docs = Demo.table(spark, sf(), "documents")
    val a = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.repetitionSignalsKernel(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a.size == 500 && a == b)
  }

  test("gopherSignals: each published rule fails its planted violator") {
    import graft.text.TextAnalysis
    // 60 prose-ish words incl. ≥2 Gopher stops → passes every rule.
    val good = (1 to 6).map(_ =>
      "the quick brown fox jumps over that lazy dog to have fun with it")
      .mkString(" ")
    val docs = Seq(
      0L -> good,
      1L -> "the and of short",                       // < 50 words
      2L -> good.split(" ").map(w => "#" + w + "#").mkString(" "), // hash soup
      3L -> good.split(" ").map(_ + "...").mkString(" "),  // ellipsis soup
      4L -> (1 to 60).map(i => s"- the of bullet item $i line").mkString("\n"),
      5L -> (1 to 60).map(_ => "12345 67890 00000 11111 22222 the of")
        .mkString(" "),                               // < 80% alphabetic
      6L -> (1 to 60).map(i => s"zz$i yy$i xx$i").mkString(" ") // no stops
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherSignals(docs, "text", "doc_id")
      .select("doc_id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(got(0L), "good doc must pass")
    (1L to 6L).foreach(id => assert(!got(id), s"doc $id must fail"))
  }
}
