package graft.io

import java.io.InputStream
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 plumbing shared by the engine's file-per-partition
 * sources: one input partition per (non-splittable) archive file,
 * streaming decode with constant memory, and
 * `SupportsPushDownRequiredColumns` so projections never materialize
 * unused columns. Parallelism at Common Crawl / bulk-register scale
 * comes from file count (~90k WET files per crawl).
 */
private[io] abstract class StreamFileSource
  extends TableProvider with DataSourceRegister with Serializable {

  /** Full schema of the source. */
  def sourceSchema: StructType
  /** Parse one file's stream into records projected to `columns`. */
  def read(file: String, in: InputStream,
      columns: Array[String]): Iterator[InternalRow]

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    sourceSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      s"${shortName()} source requires a path: " +
        s"""spark.read.format("${shortName()}").load(path)""")
    val self = this
    new Table with SupportsRead {
      override def name(): String = s"${self.shortName()}:$path"
      override def schema(): StructType = sourceSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new StreamFileScanBuilder(self, path)
    }
  }
}

private[io] class StreamFileScanBuilder(src: StreamFileSource, path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = src.sourceSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new StreamFileScan(src, path, required)
}

private[io] class StreamFileScan(src: StreamFileSource, path: String,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${src.shortName()}Scan(path=$path, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    // glob first (a literal path globs to itself), then expand directories
    // one level — handles load(dir), load(file) and load(dir/*.gz)
    val globbed = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = globbed.flatMap { s =>
      if (s.isDirectory) fs.listStatus(s.getPath).filter(_.isFile)
      else Array(s)
    }
    files.map(f => StreamFilePartition(f.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StreamFileReaderFactory(src, required.fieldNames)
}

private[io] case class StreamFilePartition(file: String) extends InputPartition

private[io] class StreamFileReaderFactory(src: StreamFileSource,
    columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[StreamFilePartition].file
    new PartitionReader[InternalRow] {
      private val fs = new Path(file).getFileSystem(new Configuration())
      private val stream = fs.open(new Path(file))
      private val it = src.read(file, stream, columns)
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = stream.close()
    }
  }
}

/** `spark.read.format("wet").load(path)` — WET (WARC text-conversion)
  * archives via [[Sources.parseWetStream]] (truncation-tolerant gzip). */
class WetDataSource extends StreamFileSource {
  override def shortName(): String = "wet"
  override def sourceSchema: StructType = WetDataSource.Schema
  override def read(file: String, in: InputStream,
      columns: Array[String]): Iterator[InternalRow] =
    Sources.parseWetStream(file, in).map { r =>
      InternalRow.fromSeq(columns.toSeq.map {
        case "source_file" => UTF8String.fromString(r.source_file)
        case "url" => UTF8String.fromString(r.url)
        case "content" => UTF8String.fromString(r.content)
      })
    }
}

object WetDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("source_file", StringType),
    StructField("url", StringType),
    StructField("content", StringType)))
}

/** `spark.read.format("warc").load(path)` — raw WARC response archives
  * via [[Sources.parseWarcStream]] (truncation-tolerant gzip): one row
  * per HTTP response with its status and Content-Type, the HTML payload
  * ready for [[graft.text.HtmlExtract]] main-content extraction. */
class WarcDataSource extends StreamFileSource {
  override def shortName(): String = "warc"
  override def sourceSchema: StructType = WarcDataSource.Schema
  override def read(file: String, in: InputStream,
      columns: Array[String]): Iterator[InternalRow] =
    Sources.parseWarcStream(file, in).map { r =>
      InternalRow.fromSeq(columns.toSeq.map {
        case "source_file" => UTF8String.fromString(r.source_file)
        case "url" => UTF8String.fromString(r.url)
        case "http_status" => UTF8String.fromString(r.http_status)
        case "content_type" => UTF8String.fromString(r.content_type)
        case "html" => UTF8String.fromString(r.html)
      })
    }
}

object WarcDataSource {
  val Schema: StructType = StructType(
    Seq("source_file", "url", "http_status", "content_type", "html")
      .map(StructField(_, StringType)))
}

/** `spark.read.format("abr-xml").load(path)` — ABR bulk-extract XML via
  * the streaming StAX parser [[Sources.parseAbrStream]]. */
class AbrXmlDataSource extends StreamFileSource {
  override def shortName(): String = "abr-xml"
  override def sourceSchema: StructType = AbrXmlDataSource.Schema
  override def read(file: String, in: InputStream,
      columns: Array[String]): Iterator[InternalRow] =
    Sources.parseAbrStream(in).map { r =>
      InternalRow.fromSeq(columns.toSeq.map { c =>
        UTF8String.fromString(c match {
          case "abn" => r.abn
          case "entity_name" => r.entity_name
          case "entity_type" => r.entity_type
          case "entity_status" => r.entity_status
          case "state" => r.state
          case "postcode" => r.postcode
          case "start_date" => r.start_date
        })
      })
    }
}

object AbrXmlDataSource {
  val Schema: StructType = StructType(
    Seq("abn", "entity_name", "entity_type", "entity_status", "state",
      "postcode", "start_date").map(StructField(_, StringType)))
}
