package graft

import graft.io.Sources
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

/** S1-S3 source parsers (reference: src/ingest/parse_commoncrawl.py,
  * src/ingest/parse_abr.py) over synthetic WET/XML fixtures. */
class SourcesSpec extends AnyFunSuite with SparkSpec {

  private def gz(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes(StandardCharsets.UTF_8)); g.close()
    bos.toByteArray
  }

  private val wetText =
    """WARC/1.0
      |WARC-Type: warcinfo
      |WARC-Date: 2025-01-01T00:00:00Z
      |Content-Length: 10
      |
      |isPartOf: x
      |WARC/1.0
      |WARC-Type: conversion
      |WARC-Target-URI: https://www.acme.com.au/about
      |Content-Type: text/plain
      |Content-Length: 200
      |
      |Welcome to ACME Corporation Pty Ltd. We are a leading manufacturer.
      |Industry: Manufacturing and Engineering Services etc etc etc.
      |Contact us at info@acme.com.au for details about our company today.
      |WARC/1.0
      |WARC-Type: conversion
      |WARC-Target-URI: https://example.com/page
      |Content-Length: 150
      |
      |Not an Australian site but has plenty of text to pass the length
      |threshold easily with room to spare in this body of filler text.
      |WARC/1.0
      |WARC-Type: conversion
      |WARC-Target-URI: https://tiny.com.au/
      |Content-Length: 5
      |
      |short
      |""".stripMargin

  test("WET stream parse: conversion records only, header/body split") {
    val recs = Sources.parseWetStream("f",
      new ByteArrayInputStream(gz(wetText))).toList
    assert(recs.map(_.url) === List(
      "https://www.acme.com.au/about", "https://example.com/page",
      "https://tiny.com.au/"))
    assert(recs.head.content.contains("ACME Corporation"))
    assert(!recs.head.content.contains("WARC-Type"))
  }

  test("WET truncated gzip yields parsed prefix (partial downloads)") {
    // Incompressible bodies so half the compressed bytes still decode to
    // many complete records (mirrors a 10 MB Range-request partial file).
    val rnd = new scala.util.Random(42)
    val big = (0 until 200).map { i =>
      s"""WARC/1.0
         |WARC-Type: conversion
         |WARC-Target-URI: https://site$i.com.au/
         |Content-Length: 300
         |
         |${List.fill(6)(rnd.alphanumeric.take(50).mkString).mkString("\n")}
         |""".stripMargin
    }.mkString
    val full = gz(big)
    val cut = full.take(full.length / 2) // mid-stream truncation
    val recs = Sources.parseWetStream("f",
      new ByteArrayInputStream(cut)).toList
    assert(recs.nonEmpty && recs.length < 200) // prefix recovered, no exception
  }

  test("webCompanies: .au filter, length filter, columnar extraction") {
    val dir = new File("target/tmp/wet"); dir.mkdirs()
    val f = new File(dir, "part-0.warc.wet.gz")
    val os = new FileOutputStream(f); os.write(gz(wetText)); os.close()
    val df = Sources.webCompanies(spark, f.getAbsolutePath)
    val rows = df.collect()
    assert(rows.length === 1) // example.com filtered (not .au), tiny.com.au (<100 chars)
    val r = rows.head
    assert(r.getAs[String]("domain") === "acme.com.au")
    // Pattern 1 (utils.py:199) matches from the first capital letter, so
    // the "Welcome to" prefix is included — stripped later by
    // clean_company_name (clean_commoncrawl.py:80-115).
    assert(r.getAs[String]("company_name") === "Welcome to ACME Corporation Pty Ltd")
    assert(r.getAs[String]("raw_text").nonEmpty)
    assert(!r.getAs[String]("raw_text").contains("info@acme.com.au")) // emails stripped
  }

  private val abrXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<Transfer>
      |<ABR recordLastUpdatedDate="20240101">
      |  <ABN status="ACT" ABNStatusFromDate="20200101">51824753556</ABN>
      |  <EntityType><EntityTypeInd>PRV</EntityTypeInd><EntityTypeText>Australian Private Company</EntityTypeText></EntityType>
      |  <MainEntity>
      |    <NonIndividualName type="MN"><NonIndividualNameText>ACME CORPORATION PTY LTD</NonIndividualNameText></NonIndividualName>
      |    <BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000</Postcode></AddressDetails></BusinessAddress>
      |  </MainEntity>
      |</ABR>
      |<ABR>
      |  <ABN status="CAN" ABNStatusFromDate="2019-06-15">12 345 678 901</ABN>
      |  <LegalEntity>
      |    <IndividualName><GivenName>JANE</GivenName><GivenName>MARY</GivenName><FamilyName>SMITH</FamilyName></IndividualName>
      |    <BusinessAddress><AddressDetails><State>VIC</State><Postcode>3000</Postcode></AddressDetails></BusinessAddress>
      |  </LegalEntity>
      |</ABR>
      |<ABR>
      |  <ABN status="ACT" ABNStatusFromDate="15/03/2018">98765432109</ABN>
      |  <MainEntity><NonIndividualName><NonIndividualNameText></NonIndividualNameText></NonIndividualName></MainEntity>
      |  <EntityName>Fallback Name Co</EntityName>
      |  <AddressDetails><State>QLD</State></AddressDetails>
      |</ABR>
      |<ABR><ABN status="ACT">11111111111</ABN></ABR>
      |</Transfer>
      |""".stripMargin

  test("ABR XML parse: multi-path names, attrs, addresses, dates") {
    val recs = Sources.parseAbrStream(new ByteArrayInputStream(
      abrXml.getBytes(StandardCharsets.UTF_8))).toList
    assert(recs.length === 3) // 4th has no name → dropped (parse_abr.py:108-110)

    val acme = recs(0)
    assert(acme.abn === "51824753556")
    assert(acme.entity_name === "ACME CORPORATION PTY LTD")
    assert(acme.entity_type === "PRV") // EntityTypeInd seen first in doc order
    assert(acme.entity_status === "ACT")
    assert(acme.state === "NSW" && acme.postcode === "2000")
    assert(acme.start_date === "2020-01-01")

    val jane = recs(1)
    assert(jane.abn === "12345678901") // spaces stripped
    assert(jane.entity_name === "JANE MARY SMITH") // given+given+family
    assert(jane.state === "VIC")
    assert(jane.start_date === "2019-06-15")

    val fb = recs(2)
    assert(fb.entity_name === "Fallback Name Co") // empty MainEntity text skipped
    assert(fb.state === "QLD" && fb.postcode === null)
    assert(fb.start_date === "2018-03-15") // dd/MM/yyyy
  }

  test("ABR XML truncated mid-document yields parsed prefix") {
    val cut = abrXml.substring(0, abrXml.indexOf("<ABR>\n  <ABN status=\"ACT\" ABNStatusFromDate=\"15/03/2018\"") + 30)
    val recs = Sources.parseAbrStream(new ByteArrayInputStream(
      cut.getBytes(StandardCharsets.UTF_8))).toList
    assert(recs.map(_.abn) === List("51824753556", "12345678901"))
  }

  test("abrEntities DataFrame end-to-end over a file") {
    val dir = new File("target/tmp/abr"); dir.mkdirs()
    val f = new File(dir, "abr1.xml")
    val os = new FileOutputStream(f)
    os.write(abrXml.getBytes(StandardCharsets.UTF_8)); os.close()
    val df = Sources.abrEntities(spark, f.getAbsolutePath)
    assert(df.columns.toSeq === Seq("abn", "entity_name", "entity_type",
      "entity_status", "state", "postcode", "start_date"))
    assert(df.count() === 3)
    // Feeds straight into the cleaning stage
    val cleaned = graft.etl.Clean.abr(df)
    assert(cleaned.filter(org.apache.spark.sql.functions.col("is_valid_abn"))
      .count() === 1) // 51824753556 is the known-valid checksum ABN
  }
}
