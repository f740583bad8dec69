package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Gvt

/** Column mapping (rename/drop by stable physical name, history never
  * rewritten): schema commits move ZERO data bytes, files stay
  * physically named forever (appends AND every rewrite op translate
  * logical → physical on the way in), every version reads under its
  * own names, pruning translates logical range columns to physical
  * manifest stats, the mapping survives vacuum via the checkpoint,
  * rewrites purge retired physical slots, and the few things that
  * cannot be served (the stock-parquet DSv2 connector, mapping-
  * corrupting appends/renames) refuse loudly instead of matching
  * physical names silently.
  */
class GvtColMapSpec extends GraftSuite {
  import spark.implicits._

  private def slab(from: Long, until: Long): DataFrame =
    (from until until).map(k => (k, k * 10, s"c${k % 3}")).toDF("k", "v", "tag")

  private def dataFiles(dir: String): Map[String, Long] = {
    val d = Paths.get(dir, "data")
    val it = java.nio.file.Files.walk(d)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally it.close()
  }

  test("rename + drop are metadata-only; files stay physically named") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 100), Seq("k"))           // v0
    val before = dataFiles(dir)
    Gvt.renameColumn(spark, dir, "v", "value")               // v1
    Gvt.dropColumn(spark, dir, "tag")                        // v2
    assert(dataFiles(dir) == before,
      "a schema commit touched data files — the whole point is it must not")
    // head reads logical names; old versions read their own
    assert(Gvt.read(spark, dir).columns.toSeq == Seq("k", "value"))
    assert(Gvt.read(spark, dir, asOf = Some(0)).columns.toSeq ==
      Seq("k", "v", "tag"))
    assert(Gvt.read(spark, dir, asOf = Some(1)).columns.toSeq ==
      Seq("k", "value", "tag"))
    // values ride the rename untouched
    assert(Gvt.read(spark, dir).agg(sum("value")).head.getLong(0) ==
      (0L until 100L).map(_ * 10).sum)
  }

  test("appends after a rename write the STABLE physical name") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 100), Seq("k"))
    Gvt.renameColumn(spark, dir, "v", "value")
    val before = dataFiles(dir).keySet
    Gvt.append(spark, dir,
      (100L until 150L).map(k => (k, k * 10, "x")).toDF("k", "value", "tag"),
      Seq("value"))
    val newFile = (dataFiles(dir).keySet -- before).head
    // the new file's FOOTER carries the physical name — all files of
    // the table agree physically, only metadata maps to logical
    assert(spark.read.parquet(newFile).columns.contains("v"),
      "post-rename append wrote the logical name into the file")
    assert(Gvt.read(spark, dir).filter(col("value") === 1200L).count() == 1)
    // stats columns translated too: manifest keys the physical name
    val added = Gvt.snapshot(dir).filter(f => newFile.endsWith(f.path))
    assert(added.nonEmpty && added.head.min.contains("v"),
      s"manifest stats keyed logically: ${added.map(_.min)}")
  }

  test("pruning translates the logical range column to physical stats") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    (0 until 4).foreach(i =>
      Gvt.append(spark, dir, slab(i * 100, i * 100 + 100), Seq("k")))
    Gvt.renameColumn(spark, dir, "k", "id")
    val (df, scanned, total) =
      Gvt.readPruned(spark, dir, "id", 150.0, 160.0)
    assert(total == 4 && scanned == 1,
      s"logical-name prune read $scanned of $total")
    assert(df.count() == 11)
  }

  test("mapping survives vacuum via the checkpoint") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 100), Seq("k"))
    Gvt.renameColumn(spark, dir, "v", "value")
    Gvt.append(spark, dir,
      (100L until 120L).map(k => (k, k, "y")).toDF("k", "value", "tag"),
      Seq("k"))
    Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L) // floor past the rename doc
    assert(!Files.exists(Paths.get(dir, Gvt.LogDir, f"${1}%08d.json")),
      "setup: the rename commit should be vacuumed")
    assert(Gvt.read(spark, dir).columns.contains("value"),
      "mapping lost with the vacuumed schema commit — checkpoint must carry it")
  }

  test("rewrite ops speak logical names on a mapped table") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 100), Seq("k"))
    Gvt.renameColumn(spark, dir, "v", "value")
    Gvt.dropColumn(spark, dir, "tag")
    // CoW delete by logical predicate
    Gvt.delete(spark, dir, col("value") > 900L, Seq("k"))
    assert(Gvt.read(spark, dir).count() == 91)
    // MoR delete (DV) by logical predicate, then absorb
    Gvt.deleteWhereDV(spark, dir, col("value") === 0L)
    assert(Gvt.read(spark, dir).count() == 90)
    Gvt.absorbDeletes(spark, dir, 0.0, Seq("k"))
    assert(Gvt.read(spark, dir).count() == 90)
    assert(Gvt.snapshot(dir).forall(f => Option(f.dv).forall(_.isEmpty)))
    // merge by logical key with a logical-schema source; the rewritten
    // files must STAY physically named (v on disk, value at the face)
    import spark.implicits._
    Gvt.merge(spark, dir,
      Seq((5L, 5000L), (200L, 2000L)).toDF("k", "value"), "k", Seq("k"))
    val head = Gvt.read(spark, dir)
    assert(head.columns.toSeq == Seq("k", "value"))
    assert(head.filter(col("k") === 5L).head.getLong(1) == 5000L)
    assert(head.count() == 91) // 90 + 1 insert
    assert(Gvt.snapshot(dir).forall(_.min.keySet.forall(_ == "k")),
      "manifest stats keyed logically after a mapped rewrite")
    // deleteKeys by logical key column
    Gvt.deleteKeys(spark, dir, Seq(200L).toDF("k"), "k", Seq("k"))
    assert(Gvt.read(spark, dir).count() == 90)
    // compact survives the mapping too
    Gvt.compact(spark, dir, smallRows = 1000L, targetFiles = 1, Seq("value"))
    assert(Gvt.read(spark, dir).count() == 90)
    assert(Gvt.read(spark, dir).columns.toSeq == Seq("k", "value"))
    // the LOGICAL name must never appear as a manifest stats key —
    // stats are physically keyed no matter which op wrote the file
    assert(Gvt.snapshot(dir).forall(f => !f.min.keySet.contains("value")),
      s"logical name leaked into manifest stats: ${Gvt.snapshot(dir).map(_.min)}")
  }

  test("merge on a RENAMED key: probe and stats run on the physical slot") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 100), Seq("v"))
    Gvt.renameColumn(spark, dir, "v", "value")
    // key = the renamed LOGICAL name; the manifest stats (and the
    // file-pruning probe) live under the physical slot 'v' — a
    // regression matching logical keys against physical stats would
    // mis-prune or crash here
    Gvt.merge(spark, dir,
      Seq((5L, 50L, "m"), (999000L, 999L, "m")).toDF("k", "value", "tag"),
      "value", Seq("value"))
    val head = Gvt.read(spark, dir)
    assert(head.count() == 101) // 100 rows, value=50 replaced, 999 inserted
    val upserted = head.filter(col("value") === 50L).collect()
    assert(upserted.length == 1 && upserted.head.getString(2) == "m",
      "renamed-key upsert did not replace the matched row")
    assert(head.filter(col("value") === 999L).count() == 1, "insert missed")
    assert(Gvt.snapshot(dir).forall(f => !f.min.keySet.contains("value")),
      "manifest stats must key the PHYSICAL name after a renamed-key merge")
    // and deleteKeys by the renamed key
    Gvt.deleteKeys(spark, dir, Seq(999L).toDF("value"), "value", Seq("value"))
    assert(Gvt.read(spark, dir).count() == 100)
  }

  test("dropped physical slots are PURGED by every rewrite (no ride past vacuum)") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    (0 until 3).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10, i * 10 + 10), Seq("k")))
    Gvt.dropColumn(spark, dir, "tag")
    Gvt.compact(spark, dir, smallRows = 1000L, targetFiles = 1, Seq("k"))
    // the compacted FOOTER must not carry the retired slot: otherwise
    // dropColumn + compact + vacuum would keep the data invisibly
    // (the GDPR-erasure story)
    val live = Gvt.snapshot(dir)
    assert(live.size == 1)
    assert(!spark.read.parquet(s"$dir/${live.head.path}")
      .columns.contains("tag"),
      "compact carried a dropped column's data into a post-drop file")
    assert(Gvt.read(spark, dir).count() == 30)
    // reserved names cannot enter the mapping
    intercept[IllegalArgumentException] {
      Gvt.renameColumn(spark, dir, "v", "_gvt_file")
    }
  }

  test("what STAYS refused on a mapped table refuses loudly") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 100), Seq("k"))
    Gvt.renameColumn(spark, dir, "v", "value")
    Gvt.dropColumn(spark, dir, "tag")
    // the DSv2 connector serves mapped tables since r12: LOGICAL names,
    // dropped slot gone, data identical to Gvt.read
    val viaConnector =
      spark.read.format("gvt").option("path", dir).load()
    assert(viaConnector.columns.toSeq == Seq("k", "value"))
    assert(viaConnector.count() == 100)
    import spark.implicits._
    // appends that would corrupt the mapping
    intercept[IllegalArgumentException] { // dropped column resurrected
      Gvt.append(spark, dir,
        Seq((1000L, 1L, "z")).toDF("k", "value", "tag"), Seq("k"))
    }
    intercept[IllegalArgumentException] { // physical slot of a rename
      Gvt.append(spark, dir, Seq((1000L, 1L)).toDF("k", "v"), Seq("k"))
    }
    // schema-commit validation
    intercept[IllegalArgumentException] { // target name taken
      Gvt.renameColumn(spark, dir, "value", "k")
    }
    intercept[IllegalArgumentException] { // source gone (was renamed)
      Gvt.renameColumn(spark, dir, "v", "w")
    }
    intercept[IllegalArgumentException] { // already dropped
      Gvt.dropColumn(spark, dir, "tag")
    }
  }

  test("rename may not shadow another column's physical slot (r11 review finding)") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    Gvt.renameColumn(spark, dir, "k", "id")
    // 'k' is no longer a logical name, but it IS the physical slot of
    // 'id' — renaming v→k would make writes of 'k' ambiguous and the
    // applyMapping rename chain order-dependent
    val e = intercept[IllegalArgumentException] {
      Gvt.renameColumn(spark, dir, "v", "k")
    }
    assert(e.getMessage.contains("physical storage slot"))
    assert(Gvt.read(spark, dir).columns.toSeq == Seq("id", "v", "tag"))
  }

  test("rename back to the physical name clears the mapping entry") {
    val dir = Files.createTempDirectory("gvt-cm-").toString + "/t"
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    Gvt.renameColumn(spark, dir, "v", "value")
    Gvt.renameColumn(spark, dir, "value", "v")
    assert(Gvt.mappingAt(dir).renames.isEmpty)
    assert(Gvt.read(spark, dir).columns.toSeq == Seq("k", "v", "tag"))
    // fully cleared: rewrite ops work again
    Gvt.delete(spark, dir, col("v") === 0L, Seq("k"))
    assert(Gvt.read(spark, dir).count() == 9)
  }
}
