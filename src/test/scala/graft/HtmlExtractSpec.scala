package graft

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.text.HtmlExtract
import org.apache.spark.sql.functions._

/** HTML main-content extraction + the WARC DataSource V2 provider. */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private val goodBody =
    "the spark engine reads and writes that data with the usual care here"

  test("planted boilerplate is removed: nav, link-dense cookie banner, footer, short title") {
    val html =
      s"""<html><head><title>Site</title><style>p{color:red}</style>
         |<script>var x = "content words that must not leak";</script></head>
         |<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
         |<div><a href="/ok">Accept cookies</a> <a href="/no">Decline</a></div>
         |<p>$goodBody</p>
         |<footer>Copyright 2020 Example Corp <a href="/l">Legal</a></footer>
         |</body></html>""".stripMargin
    assert(HtmlExtract.mainContent(html, 3, 0.33, 0.0) === goodBody)
  }

  test("multiple good blocks survive in order; headings join in") {
    val html = s"<h1>A fine heading indeed</h1><p>$goodBody</p>" +
      s"<div>another block with plenty of good words inside it</div>"
    assert(HtmlExtract.mainContent(html, 3, 0.33, 0.0) ===
      s"A fine heading indeed\n$goodBody\n" +
        "another block with plenty of good words inside it")
  }

  test("link density: a block that is mostly anchors is boilerplate; a block with one small link is not") {
    val linky = "<p><a href=x>click</a> <a href=y>here</a> now</p>"
    assert(HtmlExtract.mainContent(linky, 3, 0.33, 0.0) === "")
    val texty = s"<p>$goodBody <a href=x>ref</a></p>"
    assert(HtmlExtract.mainContent(texty, 3, 0.33, 0.0) ===
      s"$goodBody ref")
    // evidence frame: the linky block's density really is > 1/3
    val b = HtmlExtract.blocks(linky).head
    assert(b.linkDensity > 0.33 && b.words === 3)
  }

  test("stopword gate (opt-in): a stopword-free block fails it, prose passes") {
    val html = s"<p>$goodBody</p><p>foo bar baz qux corge grault</p>"
    assert(HtmlExtract.mainContent(html, 3, 0.33, 0.0).contains("foo bar"))
    val gated = HtmlExtract.mainContent(html, 3, 0.33, 0.2)
    assert(gated === goodBody, s"got '$gated'")
  }

  test("entities decode; inline tags do not split blocks; nested bad containers track depth") {
    val html = "<p>ham &amp; eggs &lt;still&gt; one <b>block</b> here</p>" +
      "<footer><div>deep <span>inside</span> the footer zone</div></footer>" +
      "<p>back outside with plenty of words again</p>"
    assert(HtmlExtract.mainContent(html, 3, 0.33, 0.0) ===
      "ham & eggs <still> one block here\n" +
        "back outside with plenty of words again")
  }

  test("malformed HTML degrades: truncated tag, stray >, unbalanced closes, unterminated comment") {
    // stray '>' is text; unbalanced </div> clamps at zero; the
    // unterminated tag at the end swallows only the tail
    val html = s"</div><p>a > b and $goodBody</p><p>lost tail <unclosed"
    assert(HtmlExtract.mainContent(html, 3, 0.33, 0.0) ===
      s"a > b and $goodBody")
    assert(HtmlExtract.mainContent(s"<p>$goodBody</p><!-- chopped", 3,
      0.33, 0.0) === goodBody)
    // unterminated script swallows to end of input without throwing
    assert(HtmlExtract.mainContent(
      s"<p>$goodBody</p><script>var x=1;", 3, 0.33, 0.0) === goodBody)
  }

  test("html_main_text column kernel equals the driver function over testdata-built pages") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val html = concat(lit("<body><nav><a href=x>Home</a></nav><p>"),
      col("text"), lit("</p><footer>foot notes</footer></body>"))
    val viaKernel = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.html_main_text(html).as("m"))
      .orderBy("doc_id").collect()
    val viaDriver = docs.select(col("doc_id"), html.as("h"))
      .orderBy("doc_id").collect()
      .map(r => HtmlExtract.mainContent(r.getString(1), 3, 0.33, 0.0))
    assert(viaKernel.map(_.getString(1)).toSeq === viaDriver.toSeq)
    // no UDF node: the kernel rides as a static invoke
    val plan = docs.select(
      graft.functions.GraftFunctions.html_main_text(html))
      .queryExecution.executedPlan.toString
    assert(plan.contains("static_invoke") || plan.contains("staticinvoke"),
      plan.take(500))
  }

  // ───────────────────────────── WARC source ─────────────────────────────

  private def gz(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes(StandardCharsets.UTF_8)); g.close()
    bos.toByteArray
  }

  private def freshDir(): File = {
    val d = java.nio.file.Files.createTempDirectory("graft-warcds").toFile
    d.deleteOnExit()
    d
  }

  // ACCURATE Content-Length on the response records (the parser now
  // trusts it to delimit the content block, like real WARC readers);
  // the request records carry none, exercising the marker-scan fallback
  // in the same file
  private def warcText(n: Int, name: String): String =
    (0 until n).map { i =>
      val content =
        s"""HTTP/1.1 200 OK
           |Content-Type: text/html; charset=UTF-8
           |
           |<html><body><nav><a href=x>Home</a></nav><p>real content $i of $name with words</p></body></html>
           |""".stripMargin
      val cl = content.getBytes(StandardCharsets.UTF_8).length
      s"""WARC/1.0
         |WARC-Type: response
         |WARC-Target-URI: https://site$i-$name.com.au/page
         |Content-Length: $cl
         |
         |$content
         |WARC/1.0
         |WARC-Type: request
         |WARC-Target-URI: https://site$i-$name.com.au/page
         |
         |GET /page HTTP/1.1
         |
         |""".stripMargin
    }.mkString

  private def warcFile(dir: File, name: String, n: Int): File = {
    val f = new File(dir, s"$name.warc.gz")
    val os = new FileOutputStream(f)
    os.write(gz(warcText(n, name))); os.close()
    f
  }

  test("format(\"warc\") reads response records only, with status and content type") {
    val dir = freshDir()
    warcFile(dir, "a", 3); warcFile(dir, "b", 2)
    val df = spark.read.format("warc").load(dir.getAbsolutePath)
    assert(df.columns.toSeq ===
      Seq("source_file", "url", "http_status", "content_type", "html"))
    val rows = df.collect()
    assert(rows.length === 5, "request records must be skipped")
    assert(df.rdd.getNumPartitions === 2)
    rows.foreach { r =>
      assert(r.getAs[String]("http_status") === "200")
      assert(r.getAs[String]("content_type").startsWith("text/html"))
      assert(r.getAs[String]("html").contains("<p>real content"))
    }
    // parity with the RDD-based reader
    val viaRdd = graft.io.Sources
      .warcRecords(spark, dir.getAbsolutePath + "/*.gz")
      .select("url").collect().map(_.getString(0)).sorted
    assert(rows.map(_.getAs[String]("url")).sorted.toSeq === viaRdd.toSeq)
  }

  test("truncated warc gzip yields the parsed prefix; end-to-end extraction drops the planted nav") {
    val dir = freshDir()
    val full = gz(warcText(8, "t"))
    val f = new File(dir, "t.warc.gz")
    val os = new FileOutputStream(f)
    os.write(full, 0, full.length * 3 / 4); os.close()
    val df = spark.read.format("warc").load(dir.getAbsolutePath)
    val n = df.count()
    assert(n >= 1 && n < 8, s"prefix of a truncated 8-record file, got $n")
    // WARC scan → main-content extraction: the ingest story end to end
    val main = df.select(graft.functions.GraftFunctions
        .html_main_text(col("html")).as("m"))
      .collect().map(_.getString(0))
    main.foreach { m =>
      assert(m.startsWith("real content"), m)
      assert(!m.contains("Home"), "nav boilerplate must not survive")
    }
  }

  test("Content-Length delimitation: a payload line starting with WARC/ survives intact") {
    // regression (round-12 ADVICE): the marker-scan path truncated a
    // response whose BODY contains a line beginning with "WARC/" and
    // flushed a phantom record; with an accurate Content-Length the
    // block is consumed byte-exactly and the payload survives
    val content =
      s"""HTTP/1.1 200 OK
         |Content-Type: text/html
         |
         |<html><body><p>about the
         |WARC/1.0 file format spec with plenty of words here</p></body></html>
         |""".stripMargin
    val cl = content.getBytes(StandardCharsets.UTF_8).length
    val warc =
      s"""WARC/1.0
         |WARC-Type: response
         |WARC-Target-URI: https://warcdoc.com.au/spec
         |Content-Length: $cl
         |
         |$content
         |WARC/1.0
         |WARC-Type: response
         |WARC-Target-URI: https://second.com.au/page
         |Content-Length: ${content.getBytes(StandardCharsets.UTF_8).length}
         |
         |$content
         |""".stripMargin
    val dir = freshDir()
    val f = new File(dir, "cl.warc.gz")
    val os = new FileOutputStream(f)
    os.write(gz(warc)); os.close()
    val rows = spark.read.format("warc").load(dir.getAbsolutePath)
      .collect().sortBy(_.getAs[String]("url"))
    assert(rows.length === 2, "both records must parse — no phantom flush")
    val first = rows.find(_.getAs[String]("url")
      .contains("warcdoc")).get.getAs[String]("html")
    assert(first.contains("WARC/1.0 file format spec"),
      "the WARC/ payload line must survive inside the body")
  }

  test("hostile Content-Length: an absurd declared length falls back to the marker scan, no eager allocation") {
    // round-12 ADVICE (medium): a corrupt/hostile record declaring e.g.
    // 2e9 bytes must not pre-allocate its declared size (OOM) or
    // swallow the rest of the file — lengths above MaxWarcRecordBytes
    // are treated as absent and the record parses via the marker scan
    val content =
      s"""HTTP/1.1 200 OK
         |Content-Type: text/html
         |
         |<html><body><p>legit page with plenty of words here</p></body></html>
         |""".stripMargin
    val warc =
      s"""WARC/1.0
         |WARC-Type: response
         |WARC-Target-URI: https://hostile.com.au/corrupt
         |Content-Length: 2000000000
         |
         |$content
         |WARC/1.0
         |WARC-Type: response
         |WARC-Target-URI: https://after.com.au/page
         |Content-Length: ${content.getBytes(StandardCharsets.UTF_8).length}
         |
         |$content
         |""".stripMargin
    val dir = freshDir()
    val f = new File(dir, "hostile.warc.gz")
    val os = new FileOutputStream(f)
    os.write(gz(warc)); os.close()
    val rows = spark.read.format("warc").load(dir.getAbsolutePath)
      .collect().sortBy(_.getAs[String]("url"))
    // marker scan recovers BOTH records: the hostile one ends where the
    // next WARC/ header line starts, the following record is intact
    assert(rows.length === 2,
      s"hostile length must not swallow the next record, got ${rows.length}")
    assert(rows.map(_.getAs[String]("url")).toSeq ===
      Seq("https://after.com.au/page", "https://hostile.com.au/corrupt"))
    rows.foreach(r =>
      assert(r.getAs[String]("html").contains("legit page")))
  }
}
