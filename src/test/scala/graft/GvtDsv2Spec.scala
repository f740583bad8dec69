package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
import org.apache.spark.sql.functions._

import graft.sources.Gvt

/** Evidence tests for the `gvt` DSv2 connector: a WHERE clause alone —
  * no hand-passed ranges — must reach the manifest zone-map prune
  * (file-count asserted on the executed scan's FilePartitions), the
  * data filters must show as PushedFilters (so parquet row-group
  * skipping still gets them), time travel must ride plain read options,
  * and statistics must shrink with the prune (that is what sizes
  * broadcast joins on the connector path).
  */
class GvtDsv2Spec extends GraftSuite {
  import spark.implicits._

  private def slab(from: Long, until: Long): DataFrame =
    (from until until).map(k => (k, k * 10)).toDF("k", "v")

  /** 8 range-tiled appends: file i covers k ∈ [100i, 100i+99]. */
  private lazy val tiles: String = {
    val dir = Files.createTempDirectory("gvt-dsv2-").toString + "/t"
    (0 until 8).foreach(i =>
      Gvt.append(spark, dir, slab(i * 100, i * 100 + 100), Seq("k")))
    dir
  }

  private def readGvt(opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("gvt").option("path", tiles))(
      (r, o) => r.option(o._1, o._2)).load()

  /** Executes and returns the file scans of the EXECUTED plan (AQE
    * stages unwrapped). */
  private def fileScans(df: DataFrame): Seq[FileScan] = {
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.scan }
      .collect {
        case f: FileScan => f
        case g: graft.sources.GvtScan => g.delegate // mapped/DV wrapper
      }
  }

  private def nFiles(f: FileScan): Int =
    f.toBatch.planInputPartitions()
      .map(_.asInstanceOf[FilePartition].files.length).sum

  private def nFilesRead(df: DataFrame): Int = fileScans(df).map(nFiles).sum

  test("a WHERE clause alone prunes to 2-of-8 manifest files, filters pushed") {
    val df = readGvt().filter(col("k") >= 250L && col("k") <= 340L)
    val scans = fileScans(df)
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    val desc = scans.head.description()
    assert(desc.contains("PushedFilters") &&
      desc.contains("GreaterThanOrEqual(k,250)") &&
      desc.contains("LessThanOrEqual(k,340)"),
      s"range filters not pushed:\n$desc")
    val n = nFiles(scans.head)
    assert(n == 2, s"zone-map prune read $n of 8 files (want 2: tiles 2,3)")
    // pruning is not load-bearing: the row answer is exact
    assert(df.agg(sum("v")).head.getLong(0) ==
      (250L to 340L).map(_ * 10).sum)
  }

  test("unfiltered connector scan reads exactly the manifest's 8 live files") {
    val df = readGvt()
    assert(nFilesRead(df) == 8)
    assert(df.count() == 800)
  }

  test("a non-range predicate keeps all files but still prunes rows") {
    val df = readGvt().filter((col("k") % 100L) === 0L)
    assert(nFilesRead(df) == 8, "modulo predicate must not mis-prune")
    assert(df.count() == 8)
  }

  test("versionAsOf / timestampAsOf travel through plain read options") {
    assert(readGvt("versionAsOf" -> "1").count() == 200)
    assert(readGvt("versionAsOf" -> "1")
      .filter(col("k") >= 150L).count() == 50)
    val ts = Gvt.commitAt(tiles, 2).ts
    assert(readGvt("timestampAsOf" -> ts.toString).count() == 300)
    // versionAsOf also bounds the PRUNE's manifest: 1 file of the 2
    // live at v1
    val v1 = readGvt("versionAsOf" -> "1").filter(col("k") <= 50L)
    assert(nFilesRead(v1) == 1)
  }

  test("txnDir reads through the GvtTxn view: half-transactions invisible, pruning intact") {
    val base = Files.createTempDirectory("gvt-dsv2-txn-").toString
    val fact = s"$base/fact"
    import graft.sources.GvtTxn
    GvtTxn.commit(spark, base, Seq(
      (fact, slab(0, 400), Seq("k"))))
    // crash: a fact append whose txn doc never landed
    Gvt.append(spark, fact, slab(400, 800), Seq("k"))
    def viaTxn(extra: (String, String)*): DataFrame =
      extra.foldLeft(spark.read.format("gvt")
        .option("path", fact).option("txnDir", base))(
        (r, o) => r.option(o._1, o._2)).load()
    // the orphan commit is invisible through the view...
    assert(viaTxn().count() == 400)
    // ...while a direct connector read of the table head sees it
    assert(spark.read.format("gvt").option("path", fact).load()
      .count() == 800)
    // zone-map pruning still rides the pinned snapshot's manifest
    val df = viaTxn().filter(col("k") >= 50L && col("k") <= 60L)
    assert(nFilesRead(df) < nFilesRead(viaTxn()) || nFilesRead(viaTxn()) == 1)
    assert(df.count() == 11)
    // txnVersionAsOf addresses the COORDINATOR's version axis;
    // combining txnDir with table-level time travel refuses
    assert(viaTxn("txnVersionAsOf" -> "0").count() == 400)
    intercept[Exception] {
      spark.read.format("gvt").option("path", fact)
        .option("txnDir", base).option("versionAsOf", "0").load()
    }
  }

  test("estimateStatistics shrinks with the prune (broadcast sizing input)") {
    val full = fileScans(readGvt()).head
      .estimateStatistics().sizeInBytes().getAsLong
    val pruned = fileScans(readGvt().filter(col("k") <= 50L)).head
      .estimateStatistics().sizeInBytes().getAsLong
    assert(pruned > 0 && full > pruned * 4,
      s"stats did not shrink with the prune: full=$full pruned=$pruned")
  }

  test("MoR snapshot (deletion vectors) serves correct rows through the connector") {
    val dir = Files.createTempDirectory("gvt-dsv2-dv-").toString + "/t"
    (0 until 4).foreach(i =>
      Gvt.append(spark, dir, slab(i * 100, i * 100 + 100), Seq("k")))
    Gvt.deleteWhereDV(spark, dir, col("k") % 7 === 0L)
    Gvt.deleteWhereDV(spark, dir, col("k") === 201L) // second vector pass
    def connector = spark.read.format("gvt").option("path", dir).load()
    val expected = (0L until 400L).filter(k => k % 7 != 0 && k != 201L)
    assert(connector.count() == expected.size)
    assert(connector.agg(sum("v")).head.getLong(0) == expected.map(_ * 10).sum)
    // row-for-row identical to the library's DV anti-join read
    assert(connector.orderBy("k").collect().toSeq ==
      Gvt.read(spark, dir).orderBy("k").collect().toSeq)
    // zone-map pruning still rides the DV snapshot's manifest
    val pruned = connector.filter(col("k") >= 150L && col("k") <= 160L)
    assert(nFilesRead(pruned) == 1,
      "DV snapshot must still prune files from the manifest")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      (150L to 160L).filterNot(_ % 7 == 0))
    // time travel: the pre-delete version reads DV-free (stock path)
    assert(spark.read.format("gvt").option("path", dir)
      .option("versionAsOf", "3").load().count() == 400)
  }

  test("column-mapped snapshot serves logical names through the connector, filters prune") {
    val dir = Files.createTempDirectory("gvt-dsv2-cm-").toString + "/t"
    (0 until 4).foreach(i =>
      Gvt.append(spark, dir, slab(i * 100, i * 100 + 100), Seq("k")))
    Gvt.renameColumn(spark, dir, "k", "key")
    Gvt.append(spark, dir,
      (400L until 500L).map(k => (k, k * 10)).toDF("key", "v")
        .repartition(1), Seq("key"))
    def connector = spark.read.format("gvt").option("path", dir).load()
    assert(connector.columns.toSeq == Seq("key", "v"))
    assert(connector.count() == 500)
    // a LOGICAL-name WHERE prunes via the PHYSICAL-name zone maps
    val pruned = connector.filter(col("key") >= 250L && col("key") <= 340L)
    assert(nFilesRead(pruned) == 2,
      "logical filter must reach the physical stats maps")
    assert(pruned.agg(sum("v")).head.getLong(0) ==
      (250L to 340L).map(_ * 10).sum)
    // row-identical to the library read; projection prunes to one column
    assert(connector.select("key").orderBy("key").collect().toSeq ==
      Gvt.read(spark, dir).select("key").orderBy("key").collect().toSeq)
    // time travel BELOW the rename serves the old name (stock path)
    val v3 = spark.read.format("gvt").option("path", dir)
      .option("versionAsOf", "3").load()
    assert(v3.columns.toSeq == Seq("k", "v") && v3.count() == 400)
  }

  test("DV + column mapping COMPOSED through the connector") {
    val dir = Files.createTempDirectory("gvt-dsv2-dvcm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 300), Seq("k"))
    Gvt.renameColumn(spark, dir, "v", "value")
    Gvt.deleteWhereDV(spark, dir, col("value") >= 2000L) // logical name
    val df = spark.read.format("gvt").option("path", dir).load()
    assert(df.columns.toSeq == Seq("k", "value"))
    assert(df.count() == 200)
    assert(df.orderBy("k").collect().toSeq ==
      Gvt.read(spark, dir).orderBy("k").collect().toSeq)
    // logical-name filter on the DV+mapped scan stays correct
    assert(df.filter(col("value") < 500L).count() == 50)
  }

  test("timestamp WHERE prunes date-tiled files via the chrono zone-map rule") {
    val dir = Files.createTempDirectory("gvt-dsv2-ts-").toString + "/t"
    // 8 day-tiles of a timestamp column; stats are cast strings.
    // Values built via to_timestamp so creation, stats, and the query
    // literal all resolve under the SESSION zone (UTC)
    (0 until 8).foreach { d =>
      val df = (0 until 24).map { h =>
        (f"2026-01-0${d + 1}%d $h%02d:00:00", d * 24L + h)
      }.toDF("tss", "v")
        .select(to_timestamp(col("tss")).as("ts"), col("v"))
      Gvt.append(spark, dir, df.repartition(1), Seq("ts"))
    }
    val df = spark.read.format("gvt").option("path", dir).load()
      .filter(col("ts") >= lit("2026-01-04 00:00:00").cast("timestamp") &&
        col("ts") < lit("2026-01-05 00:00:00").cast("timestamp"))
    val n = nFilesRead(df)
    assert(n <= 2, s"timestamp prune read $n of 8 files (want ≤2)")
    assert(df.count() == 24)
    // strict correctness: sum over exactly day 4's rows
    assert(df.agg(sum("v")).head.getLong(0) == (72L until 96L).sum)
    // and an out-of-range query prunes everything it can
    val none = spark.read.format("gvt").option("path", dir).load()
      .filter(col("ts") >= lit("2027-01-01 00:00:00").cast("timestamp"))
    assert(nFilesRead(none) == 0 && none.count() == 0)
  }

  test("string WHERE prunes via UTF8-binary zone maps") {
    val dir = Files.createTempDirectory("gvt-dsv2-str-").toString + "/t"
    ('a' to 'h').foreach { c =>
      val df = (0 until 50).map(i => (f"$c$i%03d", i.toLong)).toDF("s", "v")
      Gvt.append(spark, dir, df.repartition(1), Seq("s"))
    }
    val df = spark.read.format("gvt").option("path", dir).load()
      .filter(col("s") >= "c" && col("s") < "d")
    assert(nFilesRead(df) <= 2, "string range must prune by stat order")
    assert(df.count() == 50)
  }

  test("manifest bytes are stamped at write time and serve sizeInBytes") {
    val files = Gvt.snapshot(tiles)
    assert(files.forall(_.bytes > 0), "r12 writes must stamp bytes")
    files.foreach { f =>
      assert(f.bytes == java.nio.file.Files.size(
        java.nio.file.Paths.get(tiles, f.path)),
        s"${f.path}: manifest bytes ${f.bytes} != on-disk size")
    }
  }

  test("unified schema resolves from the metadata pin (no footer merge)") {
    val dir = Files.createTempDirectory("gvt-dsv2-pin-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    Gvt.append(spark, dir,
      (10L until 20L).map(k => (k, k * 10, s"w$k")).toDF("k", "v", "w"),
      Seq("k"))
    val pin = Gvt.pinnedSchema(dir)
    assert(pin.isDefined, "pin must resolve on an all-r12 log")
    assert(pin.get.fieldNames.toSeq == Seq("k", "v", "w"))
    // the pin agrees with parquet's own footer merge
    val footer = spark.read.option("mergeSchema", "true")
      .parquet(Gvt.snapshot(dir).map(f => s"$dir/${f.path}"): _*).schema
    assert(pin.get.fieldNames.toSeq == footer.fieldNames.toSeq)
    // a PRE-PIN doc in the resolution path degrades to None (fallback),
    // never to a wrong pin: strip dataSchema from commit 1's doc
    val doc = java.nio.file.Paths.get(dir, "_gvt_log", "00000001.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(java.nio.file.Files.readAllBytes(doc))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("dataSchema")
    java.nio.file.Files.delete(doc)
    java.nio.file.Files.write(doc, om.writeValueAsBytes(node))
    assert(Gvt.pinnedSchema(dir).isEmpty,
      "a pre-pin adds doc must make the unified schema unresolvable")
    // and the connector still serves the right schema via footer merge
    val df = spark.read.format("gvt").option("path", dir).load()
    assert(df.columns.toSeq == Seq("k", "v", "w") && df.count() == 20)
  }

  test("_metadata is not a connector surface (FileTable-only column)") {
    // GvtTable is not a FileTable and does not implement
    // SupportsMetadataColumns, so the hidden _metadata struct (whose
    // file_modification_time the index's synthetic statuses could not
    // serve truthfully) must not resolve — documented, not accidental
    intercept[org.apache.spark.sql.AnalysisException] {
      readGvt().select(col("_metadata")).collect()
    }
  }

  test("schema evolution reads merged: pre-evolution files backfill null") {
    val dir = Files.createTempDirectory("gvt-dsv2-evo-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    Gvt.append(spark, dir,
      (10L until 20L).map(k => (k, k * 10, s"w$k")).toDF("k", "v", "w"),
      Seq("k"))
    val df = spark.read.format("gvt").option("path", dir).load()
    assert(df.columns.toSeq == Seq("k", "v", "w"))
    assert(df.filter(col("w").isNull).count() == 10)
    assert(df.filter(col("w") === "w15").count() == 1)
  }
}
