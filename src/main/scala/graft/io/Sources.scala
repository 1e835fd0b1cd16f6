package graft.io

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.{BufferedReader, EOFException, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

/** One raw WET conversion record (reference:
  * src/ingest/parse_commoncrawl.py:79-122). */
case class WetRecord(source_file: String, url: String, content: String)

case class WarcRecord(source_file: String, url: String, http_status: String,
  content_type: String, html: String)

/** One raw ABR register row as extracted from the XML bulk extract
  * (reference: src/ingest/parse_abr.py:16-28). All string-typed; cleaning
  * and typing happen downstream in graft.etl.Clean. */
case class AbrRecord(
    abn: String,
    entity_name: String,
    entity_type: String,
    entity_status: String,
    state: String,
    postcode: String,
    start_date: String)

/**
 * Distributed file sources (SURVEY.md §2.1 S1-S3).
 *
 * The reference downloads WET/XML files to the driver and parses them with
 * a Python multiprocessing pool, then ships the full record list to Spark
 * via createDataFrame (src/common/parallel.py:348-403, src/pipeline.py:388-413)
 * — producing 50 MB serialized tasks at 2M rows (rawlog.txt:147-158).
 *
 * Here each file is one Spark task: `sc.binaryFiles` hands the executor a
 * PortableDataStream, so a 150 MB WET.gz or 1 GB XML file is *streamed*
 * through the parser with constant memory — no driver materialization, and
 * parallelism scales with file count (Common Crawl ships ~90k WET files
 * per crawl; a 1000-executor cluster saturates naturally). Only record
 * splitting is imperative; field extraction stays columnar
 * (codegen + column pruning via graft.functions.Text).
 */
object Sources {

  /** Max partition count hint: one task per file is the natural unit for
    * non-splittable gzip/XML; callers with few huge files can repartition
    * the parsed output before wide downstream ops. */
  private def binaryFiles(spark: SparkSession, path: String, minPartitions: Int) =
    spark.sparkContext.binaryFiles(path, minPartitions)

  // ───────────────────────── S1/S2: Common Crawl WET ─────────────────────────

  /**
   * Parse WET (WARC text-conversion) archives into (source_file, url,
   * content) rows. Keeps only `conversion` records, mirrors the
   * warcio-path semantics of parse_commoncrawl.py:85-122:
   * header block up to a blank line, then the body. Truncated gzip
   * (partial Range-request downloads, parse_commoncrawl.py:115-119) yields
   * the parsed prefix instead of failing the task.
   */
  def wetRecords(spark: SparkSession, path: String,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    import spark.implicits._
    binaryFiles(spark, path, mp).flatMap { case (file, pds) =>
      val in = pds.open()
      try parseWetStream(file, in)
      finally in.close()
    }.toDF()
  }

  /** Converts truncation/corruption exceptions from a partial (Range-
    * request) download into a clean end-of-stream. Must sit at the *byte*
    * level: InputStreamReader's decoder discards already-decoded chars if
    * the underlying read throws mid-buffer-fill, so catching around
    * readLine (as the reference does with Python's gzip EOFError,
    * parse_commoncrawl.py:115-119) would lose the entire parsed prefix. */
  private final class TruncationTolerant(in: InputStream) extends InputStream {
    private var dead = false
    private def guard(f: => Int): Int =
      if (dead) -1
      else try f catch { case _: java.io.IOException => dead = true; -1 }
    override def read(): Int = guard(in.read())
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      guard(in.read(b, off, len))
    override def close(): Unit = in.close()
  }

  /** Streaming WET record splitter. Materializes one record at a time. */
  private[graft] def parseWetStream(file: String, raw: InputStream): Iterator[WetRecord] = {
    val reader = new BufferedReader(new InputStreamReader(
      new TruncationTolerant(new GZIPInputStream(raw)), StandardCharsets.UTF_8), 1 << 16)
    val out = ArrayBuffer.empty[WetRecord]
    var recType: String = null
    var uri: String = null
    var inHeaders = false
    var body: StringBuilder = null

    def flush(): Unit = {
      if (recType == "conversion" && uri != null && body != null && body.nonEmpty)
        out += WetRecord(file, uri, body.toString)
      recType = null; uri = null; body = null
    }

    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("WARC/")) { // new record header block
          flush()
          inHeaders = true
          body = new StringBuilder
        } else if (inHeaders) {
          if (line.isEmpty) inHeaders = false
          else if (line.startsWith("WARC-Type:"))
            recType = line.substring("WARC-Type:".length).trim
          else if (line.startsWith("WARC-Target-URI:"))
            uri = line.substring("WARC-Target-URI:".length).trim
        } else if (body != null) {
          if (body.nonEmpty) body.append('\n')
          body.append(line)
        }
        line = reader.readLine()
      }
      flush()
    } catch {
      // Truncated/corrupt gzip from a partial (Range-request) download:
      // keep the parsed prefix, like the reference's EOFError handler plus
      // its outer catch-all (parse_commoncrawl.py:115-121).
      case _: EOFException => flush()
    }
    out.iterator
  }

  /** Byte-level line reader: readLine semantics (terminator stripped,
    * \r\n | \n) but over raw bytes, so the caller knows exact byte
    * positions and can consume a Content-Length-delimited block — a
    * char Reader buffers/decodes ahead and loses the byte offset. */
  private final class ByteLines(in: InputStream) {
    private val buf = new java.io.BufferedInputStream(in, 1 << 16)
    /** Next line (UTF-8, terminator stripped), null at clean EOF. */
    def readLine(): String = {
      val bb = new java.io.ByteArrayOutputStream(128)
      var c = buf.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') { bb.write(c); c = buf.read() }
      val bytes = bb.toByteArray
      var len = bytes.length
      if (len > 0 && bytes(len - 1) == '\r') len -= 1
      new String(bytes, 0, len, StandardCharsets.UTF_8)
    }
    /** Read exactly `n` bytes (fewer only at EOF — truncated gzip).
      * Reads in bounded chunks into a growing buffer, so memory tracks
      * bytes ACTUALLY RECEIVED — an untrusted Content-Length header
      * never pre-allocates its declared size (a corrupt record claiming
      * 2e9 would otherwise allocate ~2 GB before reading one byte). */
    def readBlock(n: Long): Array[Byte] = {
      val want = math.min(n, Int.MaxValue.toLong)
      val out = new java.io.ByteArrayOutputStream(
        math.min(want, 1L << 16).toInt)
      val chunk = new Array[Byte](1 << 16)
      var remaining = want
      while (remaining > 0) {
        val r = buf.read(chunk, 0,
          math.min(remaining, chunk.length.toLong).toInt)
        if (r < 0) return out.toByteArray // EOF: truncated gzip prefix
        out.write(chunk, 0, r)
        remaining -= r
      }
      out.toByteArray
    }
  }

  /** Largest WARC Content-Length honoured for byte-exact delimitation.
    * Real writers cap records far below this (Common Crawl truncates
    * payloads at 1 MiB); a declared length above it is treated as
    * corrupt/hostile and the record falls back to the marker scan
    * instead of buffering gigabytes on one executor thread. */
  private[graft] val MaxWarcRecordBytes: Long = 64L << 20

  /**
   * Streaming WARC `response`-record splitter — the RAW-crawl sibling
   * of [[parseWetStream]] (same truncation tolerance). Record
   * delimitation follows real WARC readers: when the WARC header block
   * carries `Content-Length`, the record's content (HTTP status line +
   * headers + payload) is consumed as EXACTLY that many bytes — a
   * payload line that happens to start with `WARC/` survives intact
   * and never truncates the record or flushes a phantom one. Only when
   * Content-Length is absent (or the gzip truncates mid-block) does the
   * parser fall back to the `WARC/` marker scan. Captures the HTTP
   * status code and Content-Type so callers can gate on `200` /
   * `text/html` BEFORE paying for extraction. Non-`response` records
   * (request, metadata, warcinfo) are skipped.
   */
  private[graft] def parseWarcStream(file: String,
      raw: InputStream): Iterator[WarcRecord] = {
    val reader = new ByteLines(
      new TruncationTolerant(new GZIPInputStream(raw)))
    val out = ArrayBuffer.empty[WarcRecord]
    var recType: String = null
    var uri: String = null
    var status: String = null
    var contentType: String = null
    var contentLength: Long = -1L
    // 0 = in WARC headers, 1 = awaiting HTTP status line, 2 = in HTTP
    // headers, 3 = in payload, -1 = outside any record
    var state = -1
    var body: StringBuilder = null

    def flush(): Unit = {
      if (recType == "response" && uri != null && body != null &&
          body.nonEmpty)
        out += WarcRecord(file, uri,
          if (status == null) "" else status,
          if (contentType == null) "" else contentType,
          body.toString)
      recType = null; uri = null; status = null; contentType = null
      contentLength = -1L
      body = null
    }

    // readLine semantics over a decoded block: terminators stripped,
    // the block's own final terminator yields no trailing empty line —
    // keeps the body byte-for-byte identical to the marker-scan path
    def lines(block: String): Array[String] = {
      val ls = block.split("\r\n|\n|\r", -1)
      if (ls.length > 1 && ls.last.isEmpty) ls.dropRight(1) else ls
    }

    // parse one Content-Length-delimited content block: optional HTTP
    // status line + headers up to a blank line, then the payload —
    // the same transitions as marker-scan states 1/2/3
    def parseBlock(block: String): Unit = {
      val ls = lines(block)
      var i = 0
      while (i < ls.length && ls(i).isEmpty) i += 1 // state-1 skip
      if (i < ls.length && ls(i).startsWith("HTTP/")) {
        val parts = ls(i).split(" ", 3)
        if (parts.length >= 2) status = parts(1)
        i += 1
        while (i < ls.length && ls(i).nonEmpty) {
          if (ls(i).toLowerCase(java.util.Locale.ROOT)
              .startsWith("content-type:"))
            contentType = ls(i).substring("content-type:".length).trim
          i += 1
        }
        if (i < ls.length) i += 1 // the blank separator
      }
      while (i < ls.length) {
        if (body.nonEmpty) body.append('\n')
        body.append(ls(i))
        i += 1
      }
      flush()
      state = -1
    }

    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("WARC/")) {
          flush()
          state = 0
          body = new StringBuilder
        } else state match {
          case 0 =>
            if (line.isEmpty) {
              if (contentLength >= 0 &&
                  contentLength <= MaxWarcRecordBytes) {
                // byte-exact content block; a short read (truncated
                // gzip) still parses the prefix we got
                parseBlock(new String(reader.readBlock(contentLength),
                  StandardCharsets.UTF_8))
              } else state = 1 // no/absurd length declared: marker scan
            }
            else if (line.startsWith("WARC-Type:"))
              recType = line.substring("WARC-Type:".length).trim
            else if (line.startsWith("WARC-Target-URI:"))
              uri = line.substring("WARC-Target-URI:".length).trim
            else if (line.toLowerCase(java.util.Locale.ROOT)
                .startsWith("content-length:"))
              contentLength = line.substring("content-length:".length)
                .trim.toLongOption.getOrElse(-1L)
          case 1 =>
            // the HTTP status line ("HTTP/1.1 200 OK"); a record whose
            // body is NOT an HTTP message (e.g. warcinfo) drops
            // straight to payload accumulation
            if (line.startsWith("HTTP/")) {
              val parts = line.split(" ", 3)
              if (parts.length >= 2) status = parts(1)
              state = 2
            } else if (line.nonEmpty) {
              state = 3
              if (body != null) body.append(line)
            }
          case 2 =>
            if (line.isEmpty) state = 3
            else if (line.toLowerCase(java.util.Locale.ROOT)
                .startsWith("content-type:"))
              contentType = line.substring("content-type:".length).trim
          case 3 if body != null =>
            if (body.nonEmpty) body.append('\n')
            body.append(line)
          case _ => ()
        }
        line = reader.readLine()
      }
      flush()
    } catch {
      case _: EOFException => flush() // truncated gzip: keep the prefix
    }
    out.iterator
  }

  /** Parse WARC response archives into (source_file, url, http_status,
    * content_type, html) rows — the raw-HTML ingest ahead of
    * [[graft.text.HtmlExtract]]. */
  def warcRecords(spark: SparkSession, path: String,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    import spark.implicits._
    binaryFiles(spark, path, mp).flatMap { case (file, pds) =>
      val in = pds.open()
      try parseWarcStream(file, in)
      finally in.close()
    }.toDF()
  }

  /**
   * Full S1 pipeline: WET scan → `.au` domain filter → min-length filter →
   * company/industry extraction — the WebCompany extract of
   * parse_commoncrawl.py:190-224, with extraction as native expressions
   * (regexp_extract cascades) instead of per-record Python.
   */
  def webCompanies(spark: SparkSession, path: String,
      domainSuffix: String = ".au"): DataFrame =
    wetRecords(spark, path)
      .filter(Text.extractDomain(col("url")).endsWith(domainSuffix))
      .filter(length(col("content")) >= 100)
      .select(
        col("url"),
        Text.extractDomain(col("url")).as("domain"),
        Text.extractCompanyFromText(col("content")).as("company_name"),
        Text.extractIndustryFromText(col("content")).as("industry"),
        substring(Text.cleanText(col("content")), 1, 5000).as("raw_text"))

  // ───────────────────────── S3: ABR XML bulk extract ─────────────────────────

  private val RecordTags = Set("ABRRecord", "ABR", "Record")

  /**
   * Parse ABR XML bulk-extract files into AbrRecord rows via streaming
   * StAX (javax.xml.stream) — the JVM analogue of ET.iterparse
   * (parse_abr.py:105-132) with the same multi-path fallbacks:
   * name from MainEntity/NonIndividualName > LegalEntity/NonIndividualName
   * > LegalEntity/IndividualName(given+family) > EntityName > MainName >
   * Name (parse_abr.py:136-174); state/postcode from the first of four
   * AddressDetails paths that has either (parse_abr.py:176-201); ABN text
   * + status/ABNStatusFromDate attributes (parse_abr.py:94-106); dates
   * normalized to ISO across 5 formats (parse_abr.py:219-240).
   */
  def abrEntities(spark: SparkSession, path: String,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    import spark.implicits._
    binaryFiles(spark, path, mp).flatMap { case (file, pds) =>
      val in = pds.open()
      try parseAbrStream(in).toArray.iterator
      finally in.close()
    }.toDF()
  }

  /** Streaming parse of one ABR XML document. */
  private[graft] def parseAbrStream(in: InputStream): Iterator[AbrRecord] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = factory.createXMLStreamReader(in)

    val out = ArrayBuffer.empty[AbrRecord]
    // Path stack *within* the current record, record-tag excluded.
    val path = ArrayBuffer.empty[String]
    var inRecord = false

    // Captured fields for the current record.
    var abn: String = null; var status: String = null; var fromDate: String = null
    var mainName: String = null; var legalName: String = null
    var givenNames = ArrayBuffer.empty[String]; var familyName: String = null
    var entityName: String = null; var mainNameAlt: String = null; var nameAlt: String = null
    var entityType: String = null
    // Address candidates per path-priority (lower index wins).
    val addrPaths = Array(
      "MainEntity/BusinessAddress/AddressDetails",
      "LegalEntity/BusinessAddress/AddressDetails",
      "BusinessAddress/AddressDetails",
      "AddressDetails")
    val states = new Array[String](addrPaths.length)
    val postcodes = new Array[String](addrPaths.length)
    val text = new StringBuilder

    def local(name: String): String = name

    def reset(): Unit = {
      abn = null; status = null; fromDate = null
      mainName = null; legalName = null
      givenNames = ArrayBuffer.empty[String]; familyName = null
      entityName = null; mainNameAlt = null; nameAlt = null
      entityType = null
      java.util.Arrays.fill(states.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(postcodes.asInstanceOf[Array[AnyRef]], null)
    }

    def strip(s: String): String = {
      if (s == null) return null
      val t = s.trim
      if (t.isEmpty) null else t
    }

    def emit(): Unit = {
      val a = strip(abn)
      val name = Seq(
        mainName, legalName,
        if (givenNames.nonEmpty || familyName != null)
          strip((givenNames ++ Option(familyName)).mkString(" "))
        else null,
        entityName, mainNameAlt, nameAlt).collectFirst {
        case n if strip(n) != null => strip(n)
      }.orNull
      if (a != null && name != null) {
        val addrIdx = addrPaths.indices.find(i =>
          states(i) != null || postcodes(i) != null)
        out += AbrRecord(
          abn = formatAbn(a),
          entity_name = name,
          entity_type = strip(entityType),
          entity_status = strip(status),
          state = addrIdx.map(states).orNull,
          postcode = addrIdx.map(postcodes).orNull,
          start_date = formatDate(strip(fromDate)))
      }
    }

    def pathStr: String = path.mkString("/")

    def parseLoop(): Unit = while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val tag = local(r.getLocalName)
          if (!inRecord) {
            if (RecordTags.contains(tag)) { inRecord = true; reset() }
          } else {
            path += tag
            text.setLength(0)
            if (pathStr == "ABN") {
              status = r.getAttributeValue(null, "status")
              fromDate = r.getAttributeValue(null, "ABNStatusFromDate")
            }
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inRecord && path.nonEmpty) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          val tag = local(r.getLocalName)
          if (inRecord && path.isEmpty && RecordTags.contains(tag)) {
            emit(); inRecord = false
          } else if (inRecord && path.nonEmpty) {
            val p = pathStr
            val t = text.toString
            p match {
              case "ABN" => if (abn == null) abn = t
              case "MainEntity/NonIndividualName/NonIndividualNameText" =>
                if (mainName == null) mainName = t
              case "LegalEntity/NonIndividualName/NonIndividualNameText" =>
                if (legalName == null) legalName = t
              case "LegalEntity/IndividualName/GivenName" =>
                if (strip(t) != null) givenNames += t.trim
              case "LegalEntity/IndividualName/FamilyName" =>
                if (familyName == null) familyName = strip(t)
              case "EntityType/EntityTypeText" =>
                if (entityType == null) entityType = t
              case "EntityType/EntityTypeInd" =>
                if (entityType == null) entityType = t
              case "EntityName" => if (entityName == null) entityName = t
              case "MainName/NonIndividualNameText" =>
                if (mainNameAlt == null) mainNameAlt = t
              case "Name" => if (nameAlt == null) nameAlt = t
              case _ =>
                val parent = path.dropRight(1).mkString("/")
                val i = addrPaths.indexOf(parent)
                if (i >= 0) {
                  if (tag == "State" && states(i) == null) states(i) = strip(t)
                  if (tag == "Postcode" && postcodes(i) == null) postcodes(i) = strip(t)
                }
            }
            path.remove(path.length - 1)
            text.setLength(0)
          }
        case _ => ()
      }
    }
    // Malformed/truncated XML yields the parsed prefix instead of failing
    // the task, like the reference's ET.ParseError handler
    // (parse_abr.py:87-91 logs and returns what was generated so far).
    try parseLoop()
    catch { case _: javax.xml.stream.XMLStreamException => () }
    r.close()
    out.iterator
  }

  /** Digits-only, first 11 when longer (parse_abr.py:203-207). */
  private[graft] def formatAbn(abn: String): String = {
    val digits = abn.filter(_.isDigit)
    if (digits.length >= 11) digits.substring(0, 11) else digits
  }

  private val DateFormats = Seq(
    "yyyyMMdd", "yyyy-MM-dd", "dd/MM/yyyy", "yyyy/MM/dd", "dd-MM-yyyy")

  /** Multi-format → ISO; unknown formats pass through (parse_abr.py:219-240). */
  private[graft] def formatDate(s: String): String = {
    if (s == null) return null
    DateFormats.view.flatMap { fmt =>
      val sliced = if (fmt == "yyyyMMdd") s.take(8) else s.take(10)
      try Some(java.time.LocalDate.parse(sliced,
        java.time.format.DateTimeFormatter.ofPattern(fmt)).toString)
      catch { case _: Exception => None }
    }.headOption.getOrElse(s)
  }
}
