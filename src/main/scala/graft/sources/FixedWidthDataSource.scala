package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native DataSourceV2 fixed-width text source — the SURVEY §2.1 source
  * extension point done as a first-class connector instead of
  * `read.text` + substring projection.
  *
  * Field layout comes from the `fields` option:
  * `name:start:len:type,...` (1-based start, type ∈ int|long|double|
  * string). The ScanBuilder implements
  * [[SupportsPushDownRequiredColumns]], so a query selecting 2 of N
  * columns parses exactly 2 substrings per line — Catalyst's column
  * pruning reaches INSIDE the line parser, which `read.text` can never
  * do (it always materializes the whole line).
  *
  * Scale notes: one [[InputPartition]] per file keeps the demo honest on
  * local fixtures; the production upgrade is per-block splits (fixed
  * RECORD width ⇒ any byte offset is seekable to a record boundary, so
  * fixed-width splits cleanly — unlike CSV with quoted newlines). The
  * reader streams lines; memory is O(1) per partition.
  */
class FixedWidthDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidth.schemaOf(FixedWidth.parseSpec(options.get("fields")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FixedWidthTable(properties.get("path"),
      FixedWidth.parseSpec(properties.get("fields")))
}

object FixedWidth {
  /** (name, start1based, len, type) */
  final case class Field(name: String, start: Int, len: Int, dt: DataType)

  def parseSpec(spec: String): Seq[Field] = {
    require(spec != null && spec.nonEmpty, "fixed-width needs a fields option")
    spec.split(",").toSeq.map { f =>
      val Array(n, s, l, t) = f.split(":")
      val dt = t match {
        case "int" => IntegerType
        case "long" => LongType
        case "double" => DoubleType
        case "string" => StringType
        case other => throw new IllegalArgumentException(s"type $other")
      }
      Field(n, s.toInt, l.toInt, dt)
    }
  }

  def schemaOf(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.name, f.dt, nullable = true)))

  def parse(line: String, f: Field): Any = {
    if (line.length < f.start) return null
    val raw = line.substring(f.start - 1,
      math.min(line.length, f.start - 1 + f.len)).trim
    if (raw.isEmpty) return null
    f.dt match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case DoubleType => raw.toDouble
      case StringType => UTF8String.fromString(raw)
      case other => throw new IllegalStateException(other.toString)
    }
  }
}

class FixedWidthTable(path: String, fields: Seq[FixedWidth.Field])
    extends Table with SupportsRead {
  override def name(): String = s"fixed_width($path)"
  override def schema(): StructType = FixedWidth.schemaOf(fields)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(path, fields)
}

class FixedWidthScanBuilder(path: String, fields: Seq[FixedWidth.Field])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: Seq[FixedWidth.Field] = fields

  // Catalyst hands us the pruned schema; keep spec order, drop the rest —
  // the reader then never even substrings the unused byte ranges.
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = fields.filter(f => keep.contains(f.name))
  }

  override def build(): Scan = new FixedWidthScan(path, required)
}

class FixedWidthScan(path: String, fields: Seq[FixedWidth.Field])
    extends Scan with Batch {
  override def readSchema(): StructType = FixedWidth.schemaOf(fields)
  override def toBatch: Batch = this
  override def description(): String =
    s"FixedWidthScan(${fields.map(_.name).mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => FixedWidthPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(fields)
}

final case class FixedWidthPartition(file: String) extends InputPartition

class FixedWidthReaderFactory(fields: Seq[FixedWidth.Field])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FixedWidthPartition].file
    new PartitionReader[InternalRow] {
      // local-mode simplification: default Hadoop conf (production ships
      // the driver conf via a broadcast SerializableConfiguration)
      private val p = new Path(file)
      private val in = p.getFileSystem(new Configuration()).open(p)
      private val reader =
        new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      private var line: String = _

      override def next(): Boolean = { line = reader.readLine(); line != null }
      override def get(): InternalRow =
        new GenericInternalRow(
          fields.map(f => FixedWidth.parse(line, f)).toArray)
      override def close(): Unit = reader.close()
    }
  }
}
