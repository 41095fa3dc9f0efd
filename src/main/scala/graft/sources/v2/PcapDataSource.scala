package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Pcap

/** DataSource V2 pcap/pcapng reader (SURVEY §4.2: "custom DataSource V2
  * (TableProvider + PartitionReaderFactory); one file per InputPartition
  * to preserve frame order").
  *
  * Usage: `spark.read.format("pcap").load(capturesGlob)`.
  *
  * Scale model: the unit of parallelism is the capture file — a 100 TB
  * corpus of captures fans out one task per file with zero shuffle, and
  * frame order (which reassembly depends on) is preserved within each
  * partition by construction. Column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`): a query touching only
  * `(frameNo, tsSec)` never materializes payload byte arrays.
  */
class PcapDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pcap"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PcapTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PcapTable(properties.asScala.getOrElse("path", ""))

  override def supportsExternalMetadata(): Boolean = false
}

object PcapTable {
  val Schema: StructType = StructType(Seq(
    StructField("pcapFilename", StringType, nullable = false),
    StructField("frameNo", LongType, nullable = false),
    StructField("tsSec", LongType, nullable = false),
    StructField("tsUsec", IntegerType, nullable = false),
    StructField("dlt", IntegerType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

class PcapTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"pcap($path)"
  override def schema(): StructType = PcapTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PcapScanBuilder(Option(options.get("path")).getOrElse(path))
}

class PcapScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = PcapTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PcapScan(path, required)
}

final case class PcapInputPartition(file: String) extends InputPartition

class PcapScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val hadoopPath = new Path(path)
    val fs = FileSystem.get(hadoopPath.toUri, new org.apache.hadoop.conf.Configuration())
    val statuses = Option(fs.globStatus(hadoopPath))
      .map(_.toSeq)
      .getOrElse(if (fs.exists(hadoopPath)) Seq(fs.getFileStatus(hadoopPath)) else Seq.empty)
    statuses
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(_.isFile)
      .map(s => PcapInputPartition(s.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PcapReaderFactory(required)
}

class PcapReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PcapInputPartition].file
    new PartitionReader[InternalRow] {
      private val frames = {
        val p = new Path(file)
        val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
        val in = fs.open(p)
        val bytes = try {
          val lenL = fs.getFileStatus(p).getLen
          // Whole-file decode needs a single byte[]; JVM arrays cap at
          // Int.MaxValue, so captures >= 2 GiB must fail loudly rather than
          // wrap the int cast into a negative/truncated size.
          if (lenL > Int.MaxValue - 8)
            throw new java.io.IOException(
              s"pcap file $file is $lenL bytes; the in-memory decoder supports " +
              "at most 2 GiB per capture file — split the capture")
          val len = lenL.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf)
          buf
        } finally in.close()
        Pcap.decodeFile(file, bytes).iterator
      }
      private var current: graft.sources.Frame = _

      override def next(): Boolean =
        if (frames.hasNext) { current = frames.next(); true } else false

      override def get(): InternalRow = {
        val values = required.fields.map(_.name).map {
          case "pcapFilename" => UTF8String.fromString(current.pcapFilename)
          case "frameNo" => current.frameNo
          case "tsSec" => current.tsSec
          case "tsUsec" => current.tsUsec
          case "dlt" => current.dlt
          case "data" => current.data
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = ()
    }
  }
}
