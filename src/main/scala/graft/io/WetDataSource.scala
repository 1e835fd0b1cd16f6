package graft.io

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
 * DataSource V2 provider for WET (WARC text-conversion) archives:
 * `spark.read.format("wet").load(path)` — the catalog-integrated form of
 * [[Sources.wetRecords]] (reference ingest: src/ingest/parse_commoncrawl
 * .py:85-122).
 *
 * Scale shape: one input partition per .wet.gz file (gzip is not
 * splittable; Common Crawl ships ~90k files per crawl, so a large
 * cluster parallelizes across files naturally), streaming decode with
 * constant memory per file, truncation-tolerant for partial
 * Range-request downloads. Implements `SupportsPushDownRequiredColumns`
 * so a projection of (url) never materializes content strings into rows.
 */
class WetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wet"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WetDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WetTable(properties.get("path"))
}

object WetDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("source_file", StringType),
    StructField("url", StringType),
    StructField("content", StringType)))
}

private[io] class WetTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "wet source requires a path: spark.read.format(\"wet\").load(path)")
  override def name(): String = s"wet:$path"
  override def schema(): StructType = WetDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WetScanBuilder(path)
}

private[io] class WetScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WetDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WetScan(path, required)
}

private[io] class WetScan(path: String, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WetScan(path=$path, columns=${required.fieldNames.mkString(",")})"

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
    files.map(f => WetInputPartition(f.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WetReaderFactory(required.fieldNames)
}

private[io] case class WetInputPartition(file: String) extends InputPartition

private[io] class WetReaderFactory(columns: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WetInputPartition].file
    new PartitionReader[InternalRow] {
      private val fs = new Path(file).getFileSystem(new Configuration())
      private val stream = fs.open(new Path(file))
      private val it = Sources.parseWetStream(file, stream)
      private var cur: WetRecord = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(columns.toSeq.map {
          case "source_file" => UTF8String.fromString(cur.source_file)
          case "url" => UTF8String.fromString(cur.url)
          case "content" => UTF8String.fromString(cur.content)
        })
      override def close(): Unit = stream.close()
    }
  }
}
