package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
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
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = FixedWidth.schemaOf(FixedWidth.parseSpec(options.get("fields")))
    Option(options.get("partcol")) match {
      case Some(pc) => base.add(StructField(pc, LongType, nullable = false))
      case None => base
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FixedWidthTable(properties.get("path"),
      FixedWidth.parseSpec(properties.get("fields")),
      Option(properties.get("partcol")))
}

object FixedWidth {

  /** ONE listing rule for every row/agg scan over a flat fixed-width
    * dir: visible files only (no `_staging_*`, no dotfiles), sorted for
    * a deterministic partition order; a plain file is its own
    * single-partition list. */
  private[sources] def listDataFiles(path: String): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString).sorted
    else Array(path)
  }
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

  /** Three-valued-logic-safe evaluation of a pushed filter against one
    * parsed record: a null field fails every comparison (and IsNotNull).
    */
  def evalFilter(f: Filter, get: String => Any, dtOf: String => DataType): Boolean = {
    def cmp(a: String, lit: Any): Option[Int] = {
      val v = get(a)
      if (v == null || lit == null) None
      else Some(dtOf(a) match {
        case IntegerType =>
          Integer.compare(v.asInstanceOf[Int], lit.asInstanceOf[Number].intValue)
        case LongType =>
          java.lang.Long.compare(v.asInstanceOf[Long], lit.asInstanceOf[Number].longValue)
        case DoubleType =>
          java.lang.Double.compare(v.asInstanceOf[Double], lit.asInstanceOf[Number].doubleValue)
        case StringType => v.toString.compareTo(lit.toString)
        case other => throw new IllegalStateException(other.toString)
      })
    }
    f match {
      case IsNotNull(a) => get(a) != null
      case EqualTo(a, v) => cmp(a, v).contains(0)
      case GreaterThan(a, v) => cmp(a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
      case LessThan(a, v) => cmp(a, v).exists(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).exists(_ <= 0)
      case _ => throw new IllegalStateException(s"unsupported pushed filter $f")
    }
  }

  /** Column names a pushed filter references. */
  def refs(f: Filter): Seq[String] = f.references.toSeq

  /** An aggregate accepted for pushdown into the line reader. */
  sealed trait PushedAgg
  case object CountAll extends PushedAgg
  final case class MinOf(f: Field) extends PushedAgg
  final case class MaxOf(f: Field) extends PushedAgg

  def aggName(a: PushedAgg): String = a match {
    case CountAll => "COUNT(*)"
    case MinOf(f) => s"MIN(${f.name})"
    case MaxOf(f) => s"MAX(${f.name})"
  }

  def aggSchema(aggs: Seq[PushedAgg]): StructType =
    StructType(aggs.map {
      case CountAll => StructField("count(*)", LongType, nullable = false)
      case MinOf(f) => StructField(s"min(${f.name})", f.dt, nullable = true)
      case MaxOf(f) => StructField(s"max(${f.name})", f.dt, nullable = true)
    })

  /** Total order used by pushed MIN/MAX accumulation — the same
    * comparisons [[evalFilter]] uses for pushed predicates.
    */
  def compareValues(dt: DataType, a: Any, b: Any): Int = dt match {
    case IntegerType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringType => a.toString.compareTo(b.toString)
    case other => throw new IllegalStateException(other.toString)
  }
}

class FixedWidthTable(path: String, fields: Seq[FixedWidth.Field],
    partcol: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"fixed_width($path)"
  override def schema(): StructType = {
    val base = FixedWidth.schemaOf(fields)
    partcol.fold(base)(pc => base.add(StructField(pc, LongType, nullable = false)))
  }
  // a partcol table is READ-only: the writer renders only the
  // fixed-width fields, so a partitioned write would silently drop the
  // partition column and land flat files the partitioned scan never
  // lists — declining the capability turns that silent data loss into
  // Spark's clean "table does not support batch write" analysis error
  override def capabilities(): java.util.Set[TableCapability] =
    if (partcol.isEmpty)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    partcol match {
      case Some(pc) => new FixedWidthPartitionedScanBuilder(path, fields, pc)
      case None => new FixedWidthScanBuilder(path, fields)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(partcol.isEmpty,
      s"fixed_width($path): partcol tables are read-only (see capabilities)")
    new FixedWidthWriteBuilder(path, fields, info)
  }
}

/** The WRITE side of the connector — the one DataSourceV2 surface the
  * read-only scans above don't exercise: WriteBuilder → BatchWrite with
  * the real two-phase commit protocol. Each task renders its rows to a
  * STAGED file (`_staging_<queryId>/part-<pid>-<tid>.txt`); its commit
  * message carries the staged path; the DRIVER's commit() renames every
  * staged file into place in one pass and abort() deletes them — a
  * half-written task can never surface in the final layout (rename is
  * the atomic unit, the same protocol shape as Hadoop committers).
  * `mode("overwrite")` arrives as [[SupportsTruncate]]: commit() clears
  * the prior `part-*.txt` files before the renames.
  *
  * Scale notes: rendering is per-task streaming (O(1) memory), commit
  * cost is one rename per task — at 1000 executors the driver does
  * 1000 renames, the known V2 committer cost, amortized by sizing
  * partitions. Speculative duplicates resolve at commit time: only
  * messages Spark DELIVERS get renamed; stragglers' staging files are
  * swept with the staging dir.
  */
class FixedWidthWriteBuilder(path: String, fields: Seq[FixedWidth.Field],
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new FixedWidthBatchWrite(path, fields, info.queryId(), truncateFirst)
  }
}

final case class FixedWidthCommit(stagedFile: String)
    extends WriterCommitMessage

class FixedWidthBatchWrite(path: String, fields: Seq[FixedWidth.Field],
    queryId: String, truncateFirst: Boolean) extends BatchWrite {
  private def fs = new Path(path).getFileSystem(new Configuration())
  private def stagingDir = new Path(path, s"_staging_$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new FixedWidthWriterFactory(path, fields, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    val dest = new Path(path)
    f.mkdirs(dest)
    if (truncateFirst) {
      for (g <- Seq("part-*.txt", ".part-*.txt.crc")) {
        val old = f.globStatus(new Path(dest, g))
        if (old != null) old.foreach(s => f.delete(s.getPath, false))
      }
    }
    messages.foreach { case FixedWidthCommit(staged) =>
      val sp = new Path(staged)
      val target = new Path(dest, sp.getName)
      // rename is the atomic publish — a false return (or a squatting
      // destination, which local rename would silently clobber) must
      // FAIL the commit, not drop a task's rows
      if (f.exists(target))
        throw new java.io.IOException(
          s"fixed-width commit: destination $target already exists " +
            "(concurrent append with colliding part names?)")
      if (!f.rename(sp, target))
        throw new java.io.IOException(
          s"fixed-width commit: rename $sp -> $target failed")
    }
    f.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs.delete(stagingDir, true)
}

class FixedWidthWriterFactory(path: String, fields: Seq[FixedWidth.Field],
    queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staged =
        new Path(new Path(path, s"_staging_$queryId"),
          f"part-$partitionId%05d-$taskId.txt")
      // fixed-width lines are their own integrity check (width mismatch
      // fails the parse); skip Hadoop's .crc sidecars so commit renames
      // exactly the files it staged. setWriteChecksum mutates the
      // FileSystem INSTANCE, and FileSystem.get's JVM-wide cache would
      // broadcast that to every other writer in the executor — use a
      // private uncached instance and close it with the writer.
      private val fs = {
        val f = org.apache.hadoop.fs.FileSystem.newInstance(
          staged.toUri, new Configuration())
        f.setWriteChecksum(false)
        f
      }
      private val out = fs.create(staged, true)
      private val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8))

      override def write(row: InternalRow): Unit = {
        val sb = new java.lang.StringBuilder()
        fields.zipWithIndex.foreach { case (fd, i) =>
          val s =
            if (row.isNullAt(i)) ""
            else fd.dt match {
              case IntegerType => row.getInt(i).toString
              case LongType => row.getLong(i).toString
              case DoubleType => row.getDouble(i).toString
              case StringType => row.getUTF8String(i).toString
              case other => throw new IllegalArgumentException(s"type $other")
            }
          require(s.length <= fd.len,
            s"value '$s' exceeds fixed width ${fd.len} of ${fd.name}")
          sb.append(s)
          var pad = fd.len - s.length
          while (pad > 0) { sb.append(' '); pad -= 1 }
        }
        w.write(sb.toString); w.newLine()
      }
      override def commit(): WriterCommitMessage = {
        w.close()
        FixedWidthCommit(staged.toString)
      }
      override def abort(): Unit = { w.close(); fs.delete(staged, false) }
      override def close(): Unit = fs.close() // private newInstance, not the cache
    }
}

/** ScanBuilder for the hive-layout (`<root>/<partcol>=<v>/…`) variant —
  * column pruning only; the point of this path is the REPORTED
  * partitioning, not reader-side pushdown.
  */
class FixedWidthPartitionedScanBuilder(path: String,
    fields: Seq[FixedWidth.Field], partcol: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: Seq[FixedWidth.Field] = fields
  private var includePart = true

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = fields.filter(f => keep.contains(f.name))
    includePart = keep.contains(partcol)
  }

  override def build(): Scan =
    new FixedWidthPartitionedScan(path, required, partcol, includePart)
}

/** Scan over a hive-partitioned fixed-width layout that REPORTS its
  * partitioning ([[SupportsReportPartitioning]] →
  * [[KeyGroupedPartitioning]] on the directory key, one
  * [[HasPartitionKey]] split per file): with
  * `spark.sql.sources.v2.bucketing.enabled` Spark groups the splits by
  * key and plans joins AND aggregations keyed on `partcol` WITHOUT an
  * Exchange — the storage-partitioned join. At 100 TB this is the
  * bucketed-table contract for a plain-text lake layout: the shuffle
  * happened once at write time, every subsequent key-aligned join and
  * group-by is exchange-free.
  */
class FixedWidthPartitionedScan(path: String,
    output: Seq[FixedWidth.Field], partcol: String, includePart: Boolean)
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = {
    val base = FixedWidth.schemaOf(output)
    if (includePart) base.add(StructField(partcol, LongType, nullable = false))
    else base
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"FixedWidthPartitionedScan(${output.map(_.name).mkString(",")})" +
      s" keyGrouped=[$partcol]"

  private lazy val partitions: Array[InputPartition] = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partcol="))
      .sortBy(_.getPath.getName)
      .flatMap { dir =>
        val key = dir.getPath.getName.stripPrefix(s"$partcol=").toLong
        fs.listStatus(dir.getPath)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
            && !s.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map(f => FixedWidthKeyedPartition(f.getPath.toString, key): InputPartition)
      }
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity(partcol)), partitions.length)

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthKeyedReaderFactory(output, includePart)
}

final case class FixedWidthKeyedPartition(file: String, key: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](key))
}

class FixedWidthKeyedReaderFactory(output: Seq[FixedWidth.Field],
    includePart: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val kp = partition.asInstanceOf[FixedWidthKeyedPartition]
    new PartitionReader[InternalRow] {
      private val p = new Path(kp.file)
      private val in = p.getFileSystem(new Configuration()).open(p)
      private val reader =
        new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      private var line: String = _

      override def next(): Boolean = {
        line = reader.readLine()
        line != null
      }
      override def get(): InternalRow = {
        val vals = output.map(f => FixedWidth.parse(line, f))
        new GenericInternalRow(
          (if (includePart) vals :+ (kp.key: Any) else vals).toArray)
      }
      override def close(): Unit = reader.close()
    }
  }
}

class FixedWidthScanBuilder(path: String, fields: Seq[FixedWidth.Field])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var required: Seq[FixedWidth.Field] = fields
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggs: Seq[FixedWidth.PushedAgg] = Nil

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays false —
    * a multi-file scan cannot produce the one global row): each
    * partition reader folds its lines into a single (count, min, max)
    * record instead of emitting rows, and Spark's final HashAggregate
    * merges the per-partition partials (SUM over the counts, MIN over
    * the mins). At 100 TB this turns "ship every record into an
    * aggregate" into "ship one row per file" — the scan-level
    * pre-aggregation parquet gets from row-group statistics, here for
    * a text format that has none. Accepted only for global (no GROUP
    * BY) COUNT(*) / MIN / MAX over declared columns, composed AFTER
    * filter pushdown (Catalyst only offers the aggregation once every
    * filter was consumed by the source) and never together with a
    * pushed limit.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty || limit >= 0) return false
    def fieldOf(e: V2Expression): Option[FixedWidth.Field] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        fields.find(_.name == nr.fieldNames()(0))
      case _ => None
    }
    val parsed = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(FixedWidth.CountAll)
      case m: Min => fieldOf(m.column).map(FixedWidth.MinOf)
      case m: Max => fieldOf(m.column).map(FixedWidth.MaxOf)
      case _ => None
    }
    // parsed.isEmpty: an outer count() over an already-aggregated query
    // offers an EMPTY aggregation list — accepting it vacuously makes
    // Spark expect a zero-column scan while build() would fall back to
    // the row scan ("unexpected number of columns" internal error)
    if (parsed.isEmpty || parsed.contains(None)) false
    else { aggs = parsed.flatten; true }
  }

  // PARTIAL limit pushdown (return false): each partition reader stops
  // after emitting `limit` rows — the file read ends early, which is the
  // real I/O win — while Spark keeps its own global Limit on top, since
  // a multi-file scan can exceed the bound across partitions.
  override def pushLimit(l: Int): Boolean = {
    limit = l
    false
  }

  // Catalyst hands us the pruned schema; keep spec order, drop the rest —
  // the reader then never even substrings the unused byte ranges.
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = fields.filter(f => keep.contains(f.name))
  }

  // Accept simple comparisons/null-checks on declared fields; the reader
  // evaluates them pre-emit so filtered records never become rows (and a
  // filter-only column never reaches the output schema — see the
  // evalFields union in FixedWidthScan). Residual filters go back to
  // Spark untouched.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val names = fields.map(_.name).toSet
    def ok(f: Filter): Boolean = f match {
      case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual | _: IsNotNull =>
        FixedWidth.refs(f).forall(names.contains)
      case _ => false
    }
    pushed = filters.filter(ok)
    filters.filterNot(ok)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (aggs.nonEmpty) new FixedWidthAggScan(path, fields, pushed, aggs)
    else new FixedWidthScan(path, required, fields, pushed, limit)
}

/** Scan produced when an aggregation was pushed: output schema is the
  * aggregate columns, one partial row per file partition.
  */
class FixedWidthAggScan(path: String, allFields: Seq[FixedWidth.Field],
    pushed: Array[Filter], aggs: Seq[FixedWidth.PushedAgg])
    extends Scan with Batch {

  override def readSchema(): StructType = FixedWidth.aggSchema(aggs)
  override def toBatch: Batch = this
  override def description(): String =
    s"FixedWidthAggScan pushedAggs=[${aggs.map(FixedWidth.aggName).mkString(", ")}]" +
      (if (pushed.nonEmpty) s" pushed=[${pushed.mkString(", ")}]" else "")

  override def planInputPartitions(): Array[InputPartition] =
    FixedWidth.listDataFiles(path)
      .map(f => FixedWidthPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory = {
    val filterNames = pushed.flatMap(FixedWidth.refs).toSet
    val aggNames = aggs.collect {
      case FixedWidth.MinOf(f) => f.name
      case FixedWidth.MaxOf(f) => f.name
    }.toSet
    val evalFields = allFields.filter(f =>
      filterNames.contains(f.name) || aggNames.contains(f.name))
    new FixedWidthAggReaderFactory(evalFields, pushed, aggs)
  }
}

class FixedWidthAggReaderFactory(evalFields: Seq[FixedWidth.Field],
    pushed: Array[Filter], aggs: Seq[FixedWidth.PushedAgg])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FixedWidthPartition].file
    val dtOf = evalFields.map(f => f.name -> f.dt).toMap
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in = p.getFileSystem(new Configuration()).open(p)
      private val reader =
        new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        var count = 0L
        val mins = new java.util.HashMap[String, Any]()
        val maxs = new java.util.HashMap[String, Any]()
        var line = reader.readLine()
        while (line != null) {
          val vals = evalFields.map(f => f.name -> FixedWidth.parse(line, f)).toMap
          if (pushed.forall(FixedWidth.evalFilter(_, vals, dtOf))) {
            count += 1
            aggs.foreach {
              case FixedWidth.MinOf(f) =>
                val v = vals(f.name)
                if (v != null && (mins.get(f.name) == null ||
                    FixedWidth.compareValues(f.dt, v, mins.get(f.name)) < 0))
                  mins.put(f.name, v)
              case FixedWidth.MaxOf(f) =>
                val v = vals(f.name)
                if (v != null && (maxs.get(f.name) == null ||
                    FixedWidth.compareValues(f.dt, v, maxs.get(f.name)) > 0))
                  maxs.put(f.name, v)
              case FixedWidth.CountAll => ()
            }
          }
          line = reader.readLine()
        }
        row = new GenericInternalRow(aggs.map {
          case FixedWidth.CountAll => count: Any
          case FixedWidth.MinOf(f) => mins.get(f.name)
          case FixedWidth.MaxOf(f) => maxs.get(f.name)
        }.toArray)
        done = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}

class FixedWidthScan(path: String, output: Seq[FixedWidth.Field],
    allFields: Seq[FixedWidth.Field], pushed: Array[Filter], limit: Int)
    extends Scan with Batch with SupportsReportStatistics {

  /** Planner-visible size: total bytes under the path. Without this a
    * DSv2 relation defaults to `defaultSizeInBytes` (effectively
    * infinite), so it can never sit on the build side of a broadcast
    * join; with it, a small fixed-width dim auto-broadcasts like any
    * parquet dim (asserted in SourcesSpec). Rows are estimated from the
    * pruned record width — an upper bound the optimizer treats as such.
    */
  // one listing per Scan instance — Catalyst may consult statistics
  // repeatedly while planning, and each consult must not pay a fresh
  // synchronous filesystem walk
  private lazy val totalBytes: Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    else st.getLen
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long = totalBytes
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = {
      val lineWidth = allFields.map(f => f.start - 1 + f.len).max + 1
      java.util.OptionalLong.of(bytes / math.max(lineWidth, 1))
    }
  }

  def this(path: String, output: Seq[FixedWidth.Field]) =
    this(path, output, output, Array.empty, -1)

  override def readSchema(): StructType = FixedWidth.schemaOf(output)
  override def toBatch: Batch = this
  override def description(): String =
    s"FixedWidthScan(${output.map(_.name).mkString(",")})" +
      (if (pushed.nonEmpty) s" pushed=[${pushed.mkString(", ")}]" else "") +
      (if (limit >= 0) s" limit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] =
    FixedWidth.listDataFiles(path)
      .map(f => FixedWidthPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory = {
    // parse the union of output + filter-referenced byte ranges; emit
    // only the output fields — a filter-only column costs its substring
    // but never a row slot
    val filterNames = pushed.flatMap(FixedWidth.refs).toSet
    val evalFields = allFields.filter(f =>
      output.exists(_.name == f.name) || filterNames.contains(f.name))
    new FixedWidthReaderFactory(output, evalFields, pushed, limit)
  }
}

final case class FixedWidthPartition(file: String) extends InputPartition

class FixedWidthReaderFactory(output: Seq[FixedWidth.Field],
    evalFields: Seq[FixedWidth.Field], pushed: Array[Filter], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FixedWidthPartition].file
    val dtOf = evalFields.map(f => f.name -> f.dt).toMap
    new PartitionReader[InternalRow] {
      // local-mode simplification: default Hadoop conf (production ships
      // the driver conf via a broadcast SerializableConfiguration)
      private val p = new Path(file)
      private val in = p.getFileSystem(new Configuration()).open(p)
      private val reader =
        new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      private var parsed: Map[String, Any] = _
      private var emitted = 0

      override def next(): Boolean = {
        // pushed-limit stop: quit reading the stream once this partition
        // has emitted its bound — the early-EOF that makes LIMIT cheap
        if (limit >= 0 && emitted >= limit) return false
        var line = reader.readLine()
        while (line != null) {
          val vals = evalFields.map(f => f.name -> FixedWidth.parse(line, f)).toMap
          if (pushed.forall(FixedWidth.evalFilter(_, vals, dtOf))) {
            parsed = vals
            emitted += 1
            return true
          }
          line = reader.readLine()
        }
        false
      }
      override def get(): InternalRow =
        new GenericInternalRow(output.map(f => parsed(f.name)).toArray)
      override def close(): Unit = reader.close()
    }
  }
}
