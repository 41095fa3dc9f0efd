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
    new PcapScanBuilder(Option(options.get("path")).getOrElse(path),
      Option(options.get("chunkBytes")).map(_.toLong))
}

class PcapScanBuilder(path: String, chunkBytes: Option[Long]) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = PcapTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PcapScan(path, required, chunkBytes)
}

/** One read task. `start < 0` = whole-file [[Pcap.decodeFile]] mode
  * (dense 1..N frameNo). Otherwise the chunked mode: decode records
  * whose header starts in `[start, end)`; frameNo = record file
  * offset. `ngDataStart < 0` = classic pcap with global header
  * `(le, dlt, snapCap)` ([[Pcap.decodeChunk]]); otherwise pcapng with
  * prologue state `(le, dlt, tsResol, ngDataStart)`
  * ([[Pcap.decodeNgChunk]]). */
final case class PcapInputPartition(file: String, start: Long = -1L,
    end: Long = -1L, fileLen: Long = -1L, le: Boolean = true,
    dlt: Int = -1, snapCap: Long = -1L, ngDataStart: Long = -1L,
    tsResol: Int = 6) extends InputPartition

class PcapScan(path: String, required: StructType, chunkBytes: Option[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val hadoopPath = new Path(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = FileSystem.get(hadoopPath.toUri, conf)
    val statuses = Option(fs.globStatus(hadoopPath))
      .map(_.toSeq)
      .getOrElse(if (fs.exists(hadoopPath)) Seq(fs.getFileStatus(hadoopPath)) else Seq.empty)
    val files = statuses
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(_.isFile)
    chunkBytes match {
      case None =>
        files.map(s => PcapInputPartition(s.getPath.toString): InputPartition).toArray
      case Some(chunk) =>
        require(chunk >= (1L << 16),
          s"chunkBytes must be >= 64 KiB, got $chunk")
        files.flatMap { st =>
          val p = st.getPath
          val len = st.getLen
          // plan-time head read, sized by format: 24 bytes decide a
          // classic pcap; only a pcapng magic pays for the prologue
          // window (SHB + IDBs before the first packet block — 64 KiB
          // is generous; a longer prologue falls back to the stateful
          // whole-file walk, never a wrong chunked read). Keeping the
          // classic read at 24 bytes matters at fleet scale: planning
          // 100k files must not read gigabytes on the driver.
          val head24 = new Array[Byte](math.min(24L, len).toInt)
          val in = fs.open(p)
          try in.readFully(0, head24) finally in.close()
          val head =
            if (Pcap.sniff(head24).contains(Pcap.PcapNg) && len > 24) {
              val h = new Array[Byte](math.min(1L << 16, len).toInt)
              val in2 = fs.open(p)
              try in2.readFully(0, h) finally in2.close()
              h
            } else head24
          (Pcap.classicHeader(head), Pcap.ngPrologue(head, len)) match {
            case (Some(h), _) if len > chunk =>
              (24L until len by chunk).map { start =>
                PcapInputPartition(p.toString, if (start == 24L) 24L else start,
                  math.min(start + chunk, len), len, h.le, h.dlt,
                  h.snapCap): InputPartition
              }
            case (Some(h), _) =>
              // uniform frameNo semantics across a chunked read: small
              // classic files also emit offset-numbered frames
              Seq(PcapInputPartition(p.toString, 24L, len, len, h.le, h.dlt,
                h.snapCap): InputPartition)
            case (None, Some(pro)) if pro.dataStart < len =>
              (pro.dataStart until len by chunk).map { start =>
                PcapInputPartition(p.toString, start,
                  math.min(start + chunk, len), len, pro.le, pro.dlt,
                  ngDataStart = pro.dataStart, tsResol = pro.tsResol): InputPartition
              }
            case (None, Some(_)) =>
              Seq.empty // pcapng with no packet blocks: nothing to read
            case (None, None) =>
              Seq(PcapInputPartition(p.toString): InputPartition)
          }
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PcapReaderFactory(required)
}

class PcapReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PcapInputPartition].file
    new PartitionReader[InternalRow] {
      private val part = partition.asInstanceOf[PcapInputPartition]
      private val frames = {
        val p = new Path(file)
        val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
        if (part.start < 0) {
          val in = fs.open(p)
          val bytes = try {
            val lenL = fs.getFileStatus(p).getLen
            // Whole-file decode needs a single byte[]; JVM arrays cap at
            // Int.MaxValue, so captures >= 2 GiB must fail loudly rather than
            // wrap the int cast into a negative/truncated size.
            if (lenL > Int.MaxValue - 8)
              throw new java.io.IOException(
                s"pcap file $file is $lenL bytes; the in-memory decoder supports " +
                "at most 2 GiB per capture file — split the capture, or read " +
                "with option(\"chunkBytes\", ...) for the ranged path")
            val len = lenL.toInt
            val buf = new Array[Byte](len)
            in.readFully(0, buf)
            buf
          } finally in.close()
          Pcap.decodeFile(file, bytes).iterator
        } else if (part.ngDataStart >= 0) {
          val pro = Pcap.PcapNgPrologue(part.le, part.dlt, part.tsResol,
            part.ngDataStart)
          val readEnd = math.min(part.end + Pcap.ngChunkOverhang, part.fileLen)
          val n = (readEnd - part.start).toInt
          val buf = new Array[Byte](math.max(n, 0))
          if (n > 0) {
            val in = fs.open(p)
            try in.readFully(part.start, buf) finally in.close()
          }
          Pcap.decodeNgChunk(file, buf, part.start, part.end, part.fileLen, pro).iterator
        } else {
          val h = Pcap.PcapHeader(part.le, part.dlt, part.snapCap)
          val readEnd = math.min(part.end + Pcap.chunkOverhang(h), part.fileLen)
          val n = (readEnd - part.start).toInt
          val buf = new Array[Byte](math.max(n, 0))
          if (n > 0) {
            val in = fs.open(p)
            try in.readFully(part.start, buf) finally in.close()
          }
          Pcap.decodeChunk(file, buf, part.start, part.end, part.fileLen, h).iterator
        }
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
