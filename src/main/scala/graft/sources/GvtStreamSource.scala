package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STRUCTURED STREAMING OVER THE GVT COMMIT LOG — the table format IS a
  * streaming source: the stream's offset is the table's commit version,
  * so "resume where I left off" is a number in the checkpoint, not a
  * file listing. Two modes:
  *
  *  - `mode=append` (default, the Delta-source semantics): the first
  *    micro-batch is the full snapshot at `startingVersion`; every
  *    subsequent batch is exactly the rows ADDED by the commits in
  *    `(lastServed, end]`. Layout maintenance (`compact`, `absorb`) is
  *    invisible by construction — those commits rewrite already-emitted
  *    rows, so the source emits nothing for them. A data-CHANGING
  *    rewrite (`merge`/`delete`/`dv_delete`/`restore`) fails the stream
  *    by default (already-emitted rows cannot be retracted from an
  *    append stream); `skipChangeCommits=true` opts into skipping such
  *    commits wholesale (their adds included — a rewrite's adds are old
  *    rows mixed with updates, and emitting them would duplicate).
  *  - `mode=cdc`: the change feed as a stream. The first batch is the
  *    `startingVersion` snapshot stamped `change_type='insert'`; each
  *    subsequent batch is [[Gvt.diff]] over the version range — updates
  *    surface as delete+insert pairs, DV deletes flow through (file
  *    identity includes its vectors), and maintenance diffs to empty.
  *    Downstream a signed fold over `change_type` maintains any
  *    distributive aggregate incrementally — the streaming half of the
  *    lakehouse IVM loop ([[GvtOps.refreshSummary]] is the batch half).
  *
  * Pacing: `maxVersionsPerBatch` (default 1) caps how many commits one
  * micro-batch may cover, so a consumer that fell far behind catches up
  * in bounded-size batches instead of one giant one — at 100 TB the
  * difference between a re-plannable stream and an OOM. Version caps
  * alone cannot bound one FAT commit, so `maxRowsPerBatch` (append
  * mode; manifest `rows` stats, no data read) additionally splits a
  * single commit across micro-batches at add-file boundaries via
  * sub-version offsets ([[GvtFileOffset]] — the Delta
  * (reservoirVersion, index) idea). The served high-water mark is
  * persisted under the query's `metadataPath` (inside the checkpoint
  * dir), so a restarted query resumes its version arithmetic instead
  * of re-serving the initial snapshot.
  *
  * v1 `Source` (DataFrames from `getBatch`) rather than a DSv2
  * `MicroBatchStream` is deliberate, and the same choice Delta made:
  * batches here are MANIFEST-DRIVEN reads — snapshot resolution, file
  * pruning, DV anti-joins, bag-semantics diffs — that already exist as
  * DataFrame plans; a DSv2 source would have to re-implement parquet
  * reading inside a PartitionReader and forfeit the vectorized scan.
  * The replay-file sibling ([[FixedWidthReplaySource]]) covers the DSv2
  * MicroBatchStream surface.
  */
class GvtStreamSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "gvt-stream"

  private def tableDir(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("gvt-stream needs a path option"))

  private def dataSchema(spark: org.apache.spark.sql.SparkSession,
      dir: String): StructType = {
    // LOGICAL schema (r12 review fix): the unified physical schema
    // (metadata pin when it resolves; one footer read otherwise —
    // commits never change a file, so any live file carries the
    // current write schema) aliased under the table's mapping state.
    // Without the alias, a cdc stream on a renamed table declared
    // PHYSICAL names while diff() serves logical ones — the first
    // post-rename batch crashed the stream.
    val physical = Gvt.pinnedSchema(dir).filter(_.nonEmpty).getOrElse {
      val files = Gvt.snapshot(dir)
      require(files.nonEmpty, s"gvt-stream: $dir is empty")
      spark.read.parquet(s"$dir/${files.last.path}").schema
    }
    Gvt.mapSchema(physical, Gvt.mappingAt(dir))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = dataSchema(sqlContext.sparkSession, tableDir(parameters))
    val full =
      if (parameters.getOrElse("mode", "append") == "cdc")
        StructType(base.fields.toSeq ++ Seq(
          StructField("change_type", StringType, nullable = false),
          StructField("_commit_version", LongType, nullable = false)))
      else base
    (shortName(), full)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = tableDir(parameters)
    new GvtSource(sqlContext, dir, metadataPath,
      mode = parameters.getOrElse("mode", "append"),
      startingVersion = parameters.getOrElse("startingVersion", "0").toInt,
      skipChangeCommits =
        parameters.getOrElse("skipChangeCommits", "false").toBoolean,
      maxVersionsPerBatch =
        parameters.getOrElse("maxVersionsPerBatch", "1").toInt,
      maxRowsPerBatch =
        parameters.getOrElse("maxRowsPerBatch", "0").toLong,
      base = dataSchema(sqlContext.sparkSession, dir))
  }
}

/** Sub-version stream offset: commits `< v` fully served plus the
  * first `files` add-files of commit `v` — what lets `maxRowsPerBatch`
  * split ONE giant commit across micro-batches. Emitted only when a
  * batch actually stops mid-commit; at commit boundaries the source
  * emits plain [[LongOffset]] so existing checkpoints (and their bare
  * version numbers) stay readable and new checkpoints of un-paced
  * streams stay identical to the r8 format. */
private[sources] case class GvtFileOffset(v: Long, files: Int)
    extends Offset {
  override def json: String = s"""{"v":$v,"files":$files}"""
}

class GvtSource(sqlContext: SQLContext, dir: String, metadataPath: String,
    mode: String, startingVersion: Int, skipChangeCommits: Boolean,
    maxVersionsPerBatch: Int, maxRowsPerBatch: Long, base: StructType)
    extends Source {

  require(mode == "append" || mode == "cdc",
    s"gvt-stream: unknown mode '$mode' (append|cdc)")
  require(maxVersionsPerBatch >= 1,
    s"gvt-stream: maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")
  require(maxRowsPerBatch == 0 || mode == "append",
    "gvt-stream: maxRowsPerBatch paces append mode only (a cdc diff is " +
      "a bag over whole version ranges; its batches split by version)")

  private val spark = sqlContext.sparkSession

  /** Stream position: commits `< v` fully served, plus the first
    * `files` add-files of commit `v`. `files == 0` ⇔ the classic
    * version-granular position "served through v-1". */
  private case class Pos(v: Long, files: Int) {
    def isBefore(o: Pos): Boolean = v < o.v || (v == o.v && files < o.files)
  }

  override val schema: StructType =
    if (mode == "cdc")
      StructType(base.fields.toSeq ++ Seq(
        StructField("change_type", StringType, nullable = false),
        StructField("_commit_version", LongType, nullable = false)))
    else base

  /** Highest version already handed to the engine; -1 = nothing yet.
    * Persisted under `metadataPath` so a restarted query (same
    * checkpoint) resumes incremental arithmetic — without it, a
    * restart's first getOffset would re-propose the initial snapshot
    * and the engine (which trusts the source for ranges) would re-emit
    * it. The engine's own offset log replays any uncommitted batch.
    *
    * `metadataPath` is a Hadoop path STRING with a scheme
    * (`file:/...`, or `hdfs://`/`s3a://` on a cluster), so it must be
    * resolved through Hadoop `Path`/`FileSystem` — the same pattern
    * Spark's own `FileStreamSource` uses — never `java.nio`, which
    * would treat `file:/dev/shm/...` as a RELATIVE path and write the
    * mark under the driver's cwd (outside the checkpoint: not
    * relocatable, and driver-local on a real cluster). A mark that is
    * missing or unreadable degrades safely: `lastServed` restarts at
    * -1, the engine still hands `getBatch` its COMMITTED offset as
    * `start`, and the `endV <= u` replay guard serves empty batches
    * until proposals pass it — no duplication, just idle batches. */
  private val markPath = new Path(metadataPath, "gvt-high-water")
  private val markFs =
    markPath.getFileSystem(spark.sessionState.newHadoopConf())

  private var lastServed: Option[Pos] =
    if (markFs.exists(markPath)) {
      val in = markFs.open(markPath)
      try {
        val raw = new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim
        raw.split(":") match {
          case Array(v, f) if raw.contains(":") =>
            scala.util.Try(Pos(v.toLong, f.toInt)).toOption
          case _ => // legacy bare-version mark: "served through V"
            scala.util.Try(Pos(raw.toLong + 1, 0)).toOption
        }
      } finally in.close()
    } else None

  private def persist(p: Pos): Unit = {
    // single-writer mark (one Source instance per running query), so a
    // plain overwrite-create suffices; a torn write is recovered by the
    // safe-degrade path above
    val out = markFs.create(markPath, /* overwrite = */ true)
    try out.write(s"${p.v}:${p.files}".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def posOf(o: Offset): Pos = o match {
    case l: LongOffset => Pos(l.offset + 1, 0)
    case other =>
      val j = other.json.trim
      if (j.startsWith("{")) {
        val Re = raw"""\{"v":(\d+),"files":(\d+)\}""".r
        j match {
          case Re(v, f) => Pos(v.toLong, f.toInt)
          case _ => throw new IllegalStateException(
            s"gvt-stream: unreadable offset '$j'")
        }
      } else Pos(j.toLong + 1, 0)
  }

  private def toOffset(p: Pos): Offset =
    if (p.files == 0) LongOffset(p.v - 1) else GvtFileOffset(p.v, p.files)

  /** Next batch end from `cur`: up to `maxVersionsPerBatch` commits
    * and (append mode, when `maxRowsPerBatch > 0`) up to that many
    * manifest-counted rows, stopping MID-COMMIT at a file boundary
    * when one commit alone exceeds the budget — one giant commit can
    * no longer form one giant micro-batch. Always takes at least one
    * file, so a single file larger than the budget still flows. The
    * un-paced path stays metadata-free (no commit-doc reads per
    * trigger); the paced path reads ≤ maxVersionsPerBatch docs. */
  private def advance(cur: Pos, head: Long): Pos = {
    if (maxRowsPerBatch <= 0)
      return Pos(math.min(head + 1, cur.v + maxVersionsPerBatch), 0)
    var v = cur.v
    var k = cur.files
    var rows = 0L
    var versions = 0
    var tookAny = false
    while (v <= head && versions < maxVersionsPerBatch) {
      val c = Gvt.commitAt(dir, v.toInt)
      if (c.op == "append") {
        val adds = c.adds
        while (k < adds.size) {
          val r = adds(k).rows
          if (tookAny && rows + r > maxRowsPerBatch) return Pos(v, k)
          rows += r; k += 1; tookAny = true
        }
      }
      // non-append commits (maintenance / change) carry no append rows:
      // they pass through whole, subject only to the version cap
      v += 1; k = 0; versions += 1
    }
    Pos(v, 0)
  }

  override def getOffset: Option[Offset] = {
    val head = Gvt.latestVersion(dir).toLong
    if (head < 0) None
    else lastServed match {
      case None =>
        // first batch: the startingVersion snapshot PLUS — when range
        // pacing allows (r16, the catch-up floor work) — up to
        // maxVersionsPerBatch−1 further commits of changes, so a cold
        // consumer drains a short history in ONE micro-batch instead
        // of snapshot-batch + range-batch. getBatch unions the
        // snapshot with the per-version range, so the served feed is
        // row-identical to any finer pacing (the batching-invariance
        // contract); mvpb=1 keeps the classic snapshot-only first
        // batch, and the row-paced path stays snapshot-only (the
        // snapshot's rows aren't budgeted against maxRowsPerBatch).
        if (head >= startingVersion) {
          val end =
            if (maxRowsPerBatch > 0) Pos(startingVersion + 1L, 0)
            else Pos(math.min(head + 1,
              startingVersion.toLong + maxVersionsPerBatch), 0)
          Some(toOffset(end))
        } else None
      case Some(cur) =>
        val end = advance(cur, head)
        if (cur.isBefore(end)) Some(toOffset(end)) else None
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endP = posOf(end)
    val startP = start.map(posOf)
    val out = startP match {
      case None =>
        val sv = startingVersion.toLong
        if (endP.v - 1 <= sv) initialBatch(endP.v - 1)
        // range-extended first batch: snapshot at startingVersion,
        // then the SAME per-version machinery the steady state uses —
        // every row keeps its own _commit_version (cdc) / its exact
        // add-file slice (append)
        else if (mode == "cdc")
          initialBatch(sv).unionByName(cdcBatch(sv, endP.v - 1))
        else
          initialBatch(sv).unionByName(appendBatch(Pos(sv + 1, 0), endP))
      case Some(s) if !s.isBefore(endP) =>
        // engine replay / no-advance edge: serve an empty batch rather
        // than re-emitting rows the checkpoint already committed
        emptyBatch()
      case Some(s) =>
        if (mode == "cdc") cdcBatch(s.v - 1, endP.v - 1)
        else appendBatch(s, endP)
    }
    if (lastServed.forall(_.isBefore(endP))) {
      lastServed = Some(endP); persist(endP)
    }
    StreamingShim.asStreamingFrame(out)
  }

  private def ordered(df: DataFrame): DataFrame =
    df.select(schema.fieldNames.map(col).toSeq: _*)

  /** The stream's schema is FIXED at start (`base`, logical names as of
    * construction); data files are PHYSICALLY named forever. These two
    * bridge the gap in both directions, keyed on the PHYSICAL identity
    * captured at construction — so a rename landing mid-stream neither
    * changes what the stream emits nor crashes it (the Delta rule:
    * restart the stream to pick up new names; a mid-stream DROP of a
    * streamed column still fails loudly, as it must — a fixed-schema
    * stream cannot serve a column that no longer exists). */
  private val basePhys: StructType = {
    val state0 = Gvt.mappingAt(dir)
    StructType(base.fields.map(f => f.copy(name = state0.physicalOf(f.name))))
  }

  /** Align a frame speaking version `atV`'s OWN logical names
    * ([[Gvt.read]]/[[Gvt.diff]] serve version-local schemas) to the
    * stream's start-time names, via the shared physical identity. */
  private def aligned(df: DataFrame, atV: Long): DataFrame = {
    val st = Gvt.mappingAt(dir, Some(atV.toInt))
    // atV-logical name → stream-start name, for every streamed column
    // still live at atV (a dropped column stays unmapped, so ordered()
    // fails loudly downstream — the fixed-schema-stream contract)
    val toStart: Map[String, String] = basePhys.fields.zip(base.fields)
      .flatMap { case (p, l) => st.logicalOf(p.name).map(_ -> l.name) }
      .toMap
    // ONE simultaneous positional select, NOT a withColumnRenamed fold:
    // a rename CYCLE between the start state and atV (a→b while b→a)
    // would have the first chained rename capture both columns and
    // mis-bind data; extra columns (diff's change_type) pass through
    df.select(df.columns.map(c =>
      toStart.get(c).map(n => col(c).as(n)).getOrElse(col(c)))
      .toIndexedSeq: _*)
  }

  private def emptyBatch(): DataFrame =
    ordered(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema))

  private def initialBatch(endV: Long): DataFrame = {
    val snap = aligned(Gvt.read(spark, dir, Some(endV.toInt)), endV)
    if (mode == "cdc")
      ordered(snap.withColumn("change_type", lit("insert"))
        .withColumn("_commit_version", lit(endV)))
    else ordered(snap)
  }

  /** Rows added in the position range `(s, e]` — one plain vectorized
    * parquet scan over exactly the covered add-files, sliced at file
    * granularity when the range starts or ends inside a commit (append
    * adds never carry deletion vectors, so no DV join belongs here; a
    * LATER DV delete of an already-streamed row is a change commit and
    * surfaces as such when it happens, never retroactively). Add order
    * inside a commit doc is stable (writeData sorts by path), so the
    * slice arithmetic is deterministic across restarts. */
  private def appendBatch(s: Pos, e: Pos): DataFrame = {
    val paths = (s.v to e.v).flatMap { v =>
      if (v == e.v && e.files == 0) Nil // e.v itself not yet entered
      else {
        val c = Gvt.commitAt(dir, v.toInt)
        c.op match {
          case "append" =>
            val from = if (v == s.v) s.files else 0
            val until = if (v == e.v) e.files else c.adds.size
            c.adds.slice(from, until).map(f => s"$dir/${f.path}")
          // pure layout maintenance: every row in these adds was
          // already emitted by the commit that first added it
          case "compact" | "absorb" => Nil
          case other =>
            if (skipChangeCommits) Nil
            else throw new IllegalStateException(
              s"gvt-stream: commit $v is a '$other' — an append stream " +
                "cannot retract already-emitted rows. Restart from a " +
                "fresh startingVersion, use mode=cdc, or set " +
                "skipChangeCommits=true to ignore rewrite commits.")
        }
      }
    }
    if (paths.isEmpty) emptyBatch()
    else {
      // files store PHYSICAL names: read under them (the explicit
      // schema fixes column order), emit the stream's start-time names
      // as ONE positional rename — a chained withColumnRenamed fold
      // would mis-bind under a rename cycle between the physical and
      // start-time names (same hazard as [[aligned]])
      val df = spark.read.schema(basePhys).parquet(paths: _*)
      ordered(df.toDF(base.fieldNames.toIndexedSeq: _*))
    }
  }

  /** One [[Gvt.diff]] per commit in `(u, endV]`, each stamped with ITS
    * OWN version — when `maxVersionsPerBatch > 1` a single-range diff
    * would mislabel earlier commits' changes with the range's end
    * version (and a delete+re-insert across two commits would cancel
    * out of the bag diff entirely, hiding the churn from downstream
    * IVM). Unioning per-version diffs keeps `_commit_version` exact;
    * the per-version manifests the diffs compare are O(file count), so
    * the extra plans cost manifest work, not data scans. */
  private def cdcBatch(u: Long, endV: Long): DataFrame =
    // unionByName, not positional unionAll: each per-version diff aligns
    // its own columns internally, but nothing guarantees identical
    // column ORDER across versions (schema evolution adds columns at
    // different positions) — positional union would silently misbind
    ordered(((u + 1) to endV).map { v =>
      // each per-version diff speaks ITS version's logical names;
      // align each to the stream's fixed names before the union
      aligned(Gvt.diff(spark, dir, (v - 1).toInt, v.toInt), v)
        .withColumn("_commit_version", lit(v))
    }.reduce(_ unionByName _))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
