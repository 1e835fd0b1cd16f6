package graft

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.io.Sources
import org.apache.spark.sql.functions._

/** The WET DataSource V2 provider: spark.read.format("wet"). */
class WetDataSourceSpec extends SparkSpec {

  private def gz(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes(StandardCharsets.UTF_8)); g.close()
    bos.toByteArray
  }

  private def freshDir(): File = {
    val d = java.nio.file.Files.createTempDirectory("graft-wetds").toFile
    d.deleteOnExit()
    d
  }

  private def wetFile(dir: File, name: String, nRecords: Int): File = {
    val text = (0 until nRecords).map { i =>
      s"""WARC/1.0
         |WARC-Type: conversion
         |WARC-Target-URI: https://site$i-$name.com.au/
         |Content-Length: 100
         |
         |Body text for record $i of $name with enough filler to matter.
         |""".stripMargin
    }.mkString
    val f = new File(dir, s"$name.warc.wet.gz")
    val os = new FileOutputStream(f)
    os.write(gz(text)); os.close()
    f
  }

  test("format(\"wet\") reads a directory, one partition per file") {
    val dir = freshDir()
    wetFile(dir, "a", 3); wetFile(dir, "b", 2)
    val df = spark.read.format("wet").load(dir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("source_file", "url", "content"))
    assert(df.count() == 5)
    assert(df.rdd.getNumPartitions == 2)
    // parity with the RDD-based reader
    val viaRdd = Sources.wetRecords(spark, dir.getAbsolutePath + "/*.gz")
      .select("url").collect().map(_.getString(0)).sorted
    val viaV2 = df.select("url").collect().map(_.getString(0)).sorted
    assert(viaV2.toSeq == viaRdd.toSeq)
  }

  test("column pruning reaches the scan") {
    val dir = freshDir()
    wetFile(dir, "c", 2)
    val df = spark.read.format("wet").load(dir.getAbsolutePath)
      .select("url")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("columns=url"), s"scan not pruned:\n$scan")
    assert(df.collect().forall(_.getString(0).startsWith("https://")))
  }

  test("glob patterns and single-file paths both resolve") {
    val dir = freshDir()
    wetFile(dir, "d", 2); wetFile(dir, "e", 1)
    val viaGlob = spark.read.format("wet")
      .load(dir.getAbsolutePath + "/*.wet.gz")
    assert(viaGlob.count() == 3)
    val viaFile = spark.read.format("wet")
      .load(new File(dir, "d.warc.wet.gz").getAbsolutePath)
    assert(viaFile.count() == 2)
  }

  test("format(\"abr-xml\") parses bulk-extract XML with pruning") {
    val dir = freshDir()
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Transfer>
        |<ABR>
        |  <ABN status="ACT" ABNStatusFromDate="20200101">51824753556</ABN>
        |  <EntityType><EntityTypeInd>PRV</EntityTypeInd></EntityType>
        |  <MainEntity>
        |    <NonIndividualName><NonIndividualNameText>ACME PTY LTD</NonIndividualNameText></NonIndividualName>
        |    <BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000</Postcode></AddressDetails></BusinessAddress>
        |  </MainEntity>
        |</ABR>
        |<ABR>
        |  <ABN status="CAN" ABNStatusFromDate="20190615">12345678901</ABN>
        |  <MainEntity><NonIndividualName><NonIndividualNameText>OTHER CO</NonIndividualNameText></NonIndividualName></MainEntity>
        |</ABR>
        |</Transfer>
        |""".stripMargin
    val f = new File(dir, "extract.xml")
    val os = new FileOutputStream(f)
    os.write(xml.getBytes(StandardCharsets.UTF_8)); os.close()
    val df = spark.read.format("abr-xml").load(dir.getAbsolutePath)
    assert(df.columns.length == 7)
    val rows = df.orderBy("abn").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[String]("abn") == "51824753556")
    assert(rows(1).getAs[String]("entity_name") == "ACME PTY LTD")
    assert(rows(1).getAs[String]("state") == "NSW")
    val pruned = df.select("abn")
    assert(pruned.queryExecution.executedPlan.toString.contains("columns=abn"))
    // parity with the RDD-based reader
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      Sources.abrEntities(spark, dir.getAbsolutePath + "/*.xml")
        .select("abn").collect().map(_.getString(0)).sorted.toSeq)
  }
}
