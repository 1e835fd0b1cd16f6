package graft.io

import graft.etl.Pipeline.retry

import java.io.{File, FileOutputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration
import java.util.zip.ZipFile

/**
 * Driver-side download utilities (SURVEY.md §2.1 S6/S7 — the reference's
 * src/ingest/download_commoncrawl.py and download_abr.py). These are NOT
 * Spark operators: acquisition runs on the driver (or an external
 * fetcher), lands files on shared storage, and graft.io.Sources does the
 * distributed parse. Validation logic mirrors the reference: gzip/zip
 * magic bytes, HTML-error-page detection (servers returning 200 with an
 * error page), Range-request partial downloads, retry with backoff.
 *
 * At 100 TB you would not pull Common Crawl through one driver: point
 * Sources at the bucket directly, or fan the URL list out with a Spark
 * job whose tasks call [[download]] — the validation is the part worth
 * keeping either way.
 */
object Ingest {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  val GzipMagic: Array[Byte] = Array(0x1f.toByte, 0x8b.toByte)
  val ZipMagic: Array[Byte] = Array('P'.toByte, 'K'.toByte)

  /** Leading bytes look like an HTML error page rather than an archive
    * (download_abr.py's HTML-error-page check). */
  def looksLikeHtml(head: Array[Byte]): Boolean = {
    val s = new String(head.take(64),
      java.nio.charset.StandardCharsets.ISO_8859_1).trim.toLowerCase
    s.startsWith("<!doctype") || s.startsWith("<html") || s.startsWith("<?xml-error")
  }

  def hasMagic(head: Array[Byte], magic: Array[Byte]): Boolean =
    head.length >= magic.length && magic.indices.forall(i => head(i) == magic(i))

  /**
   * Download a URL to a file with retry + magic-byte validation.
   * `rangeBytes = Some(n)` issues a partial Range request (the
   * reference's 10 MB partial WET downloads,
   * download_commoncrawl.py:172-220) — downstream parsers tolerate the
   * resulting truncated gzip.
   */
  def download(url: String, dest: File, expectMagic: Option[Array[Byte]],
      rangeBytes: Option[Long] = None, attempts: Int = 3,
      backoffMs: Long = 1000): File =
    retry(attempts, backoffMs, maxMs = 8000) {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMinutes(5)).GET()
      rangeBytes.foreach(n => b.header("Range", s"bytes=0-${n - 1}"))
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
      val code = resp.statusCode()
      if (code != 200 && code != 206)
        throw new java.io.IOException(s"HTTP $code for $url")
      val body = resp.body()
      if (looksLikeHtml(body))
        throw new java.io.IOException(s"HTML error page for $url")
      expectMagic.foreach { m =>
        if (!hasMagic(body, m))
          throw new java.io.IOException(s"bad magic bytes for $url")
      }
      val out = new FileOutputStream(dest)
      try out.write(body) finally out.close()
      dest
    }

  /** Fetch a Common Crawl paths index (gzip of newline-separated WET
    * paths) and return up to maxFiles paths
    * (download_commoncrawl.py:45-74). */
  def wetPaths(indexUrl: String, maxFiles: Int, workDir: Path): Seq[String] = {
    val f = download(indexUrl, workDir.resolve("wet.paths.gz").toFile,
      Some(GzipMagic))
    val in = new java.util.zip.GZIPInputStream(Files.newInputStream(f.toPath))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).take(maxFiles).toList
    finally in.close()
  }

  /** Parallel fan-out download (the reference's ThreadPool,
    * download_commoncrawl.py:276-348), bounded at `parallelism`. Failed
    * URLs are skipped (logged), like the reference. */
  def downloadAll(urls: Seq[String], destDir: Path,
      expectMagic: Option[Array[Byte]], rangeBytes: Option[Long] = None,
      parallelism: Int = 8): Seq[File] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, urls.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futs = urls.map { u =>
        scala.concurrent.Future {
          val name = u.split('/').last
          try Some(download(u, destDir.resolve(name).toFile, expectMagic,
            rangeBytes))
          catch {
            case e: Exception =>
              System.err.println(s"[ingest] skip $u: ${e.getMessage}")
              None
          }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf).flatten
    } finally pool.shutdown()
  }

  /** Extract .xml entries from a downloaded zip
    * (download_abr.py:129-158). */
  def extractXml(zip: File, destDir: Path): Seq[File] = {
    val zf = new ZipFile(zip)
    try {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala.filter(_.getName.toLowerCase.endsWith(".xml"))
        .map { e =>
          val dest = destDir.resolve(new File(e.getName).getName).toFile
          val in: InputStream = zf.getInputStream(e)
          val out = new FileOutputStream(dest)
          try in.transferTo(out) finally { in.close(); out.close() }
          dest
        }.toList
    } finally zf.close()
  }
}
