package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming-side DataSourceV2 exemplar: a REPLAY source that serves a
  * staged fixed-width lake layout one file per micro-batch, in file-name
  * order — the backfill/replay pattern (re-run yesterday's lake data
  * through the same streaming topology that handles live data). Offsets
  * are file INDICES into the sorted `batch-*.txt` listing: the batch
  * [start, end) maps to exactly those files, so replay is deterministic,
  * restart-safe (offsets are plain JSON longs in the checkpoint), and
  * naturally rate-limited to one file's worth of rows per batch.
  *
  * Completes the connector family's V2 surface: batch read
  * ([[FixedWidthDataSource]] — pruning/filters/limit/aggregates/
  * partitioning pushdown), batch write ([[FixedWidthWriteBuilder]] —
  * two-phase commit), and now MICRO_BATCH_READ ([[MicroBatchStream]]).
  * The line parser is shared ([[FixedWidth.parse]]).
  *
  * Scale notes: one InputPartition per file within a batch keeps replay
  * ordered at file granularity while parallelizing across cores when a
  * batch spans multiple files; at lake scale the listing comes from the
  * table's file index rather than a directory scan, and offsets stay
  * indices into that ordered manifest.
  */
class FixedWidthReplaySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidth.schemaOf(FixedWidth.parseSpec(options.get("fields")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FixedWidthReplayTable(properties.get("path"),
      FixedWidth.parseSpec(properties.get("fields")))
}

class FixedWidthReplayTable(path: String, fields: Seq[FixedWidth.Field])
    extends Table with SupportsRead {
  override def name(): String = s"fixed_width_replay($path)"
  override def schema(): StructType = FixedWidth.schemaOf(fields)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FixedWidth.schemaOf(fields)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FixedWidthReplayStream(path, fields)
      }
    }
}

/** File-index offset: `json()` is the plain long, so checkpoints stay
  * human-readable and restart resolution is trivial.
  */
final case class FileIndexOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

class FixedWidthReplayStream(path: String, fields: Seq[FixedWidth.Field])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // the ordered replay manifest, resolved once per stream start — a
  // restart re-lists and resumes from the checkpointed index
  private lazy val files: Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.globStatus(new Path(p, "batch-*.txt"))
    if (st == null) Array.empty[String]
    else st.map(_.getPath.toString).sorted
  }

  // Admission control (SupportsTriggerAvailableNow extends it): the
  // default read limit is ONE file per micro-batch, so replay drains
  // the manifest one file at a time in order; Trigger.AvailableNow pins
  // the target at stream start and runs batches until the index reaches
  // it. Pacing derives from the engine-passed start offset — no mutable
  // progress state, so checkpoint restart resumes correctly for free.
  private var target = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    target = files.length.toLong

  override def initialOffset(): Offset = FileIndexOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(1)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = if (target >= 0) target else files.length.toLong
    val step = limit match {
      case mf: ReadMaxFiles => mf.maxFiles().toLong
      case _ => cap
    }
    FileIndexOffset(
      math.min(start.asInstanceOf[FileIndexOffset].index + step, cap))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")
  override def deserializeOffset(json: String): Offset =
    FileIndexOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileIndexOffset].index.toInt
    val e = end.asInstanceOf[FileIndexOffset].index.toInt
    files.slice(s, e).map(f => FixedWidthReplayPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReplayReaderFactory(fields)
}

final case class FixedWidthReplayPartition(file: String) extends InputPartition

class FixedWidthReplayReaderFactory(fields: Seq[FixedWidth.Field])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FixedWidthReplayPartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in = p.getFileSystem(new Configuration()).open(p)
      private val reader =
        new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      private var line: String = _
      override def next(): Boolean = { line = reader.readLine(); line != null }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map(f => FixedWidth.parse(line, f)).toArray)
      override def close(): Unit = reader.close()
    }
  }
}
