package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Gvt

/** The GVT SQL surface ([[graft.sources.GvtCatalog]]): CREATE TABLE /
  * INSERT INTO / INSERT OVERWRITE / CTAS / DROP resolve to the same
  * pipeline the API uses — the central claim is SQL-written ≡
  * API-written, byte-for-byte through the oracle-grade read path.
  */
class GvtCatalogSpec extends GraftSuite {
  import spark.implicits._

  private def pathTable(): (String, String) = {
    val dir = Files.createTempDirectory("gvt-cat-").toString + "/t"
    (dir, s"gvt.`$dir`")
  }

  test("CREATE TABLE + INSERT INTO ≡ the API-written twin, exactly") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    // empty created table SELECTs as zero rows with the declared schema
    val empty = spark.sql(s"SELECT * FROM $t")
    assert(empty.columns.toSeq == Seq("k", "v") && empty.count() == 0)
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO $t SELECT id AS k, id * 10 AS v " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    // the API twin: same three commits through Gvt.append
    val twin = Files.createTempDirectory("gvt-cat-twin-").toString + "/t"
    (0 until 3).foreach { i =>
      Gvt.append(spark, twin,
        (i * 100L until i * 100L + 100L).map(k => (k, k * 10))
          .toDF("k", "v"), Seq("k"))
    }
    assert(spark.sql(s"SELECT * FROM $t ORDER BY k").collect().toSeq ==
      Gvt.read(spark, twin).orderBy("k").collect().toSeq)
    // both histories have the same version count (create is v0)
    assert(Gvt.latestVersion(dir) == 3 && Gvt.latestVersion(twin) == 2)
    // SQL inserts cluster + stat on the declared 'stats' property: a
    // WHERE through the catalog read prunes files like the API path
    val pruned = spark.sql(s"SELECT sum(v) FROM $t WHERE k >= 110 AND k <= 120")
    assert(pruned.head.getLong(0) == (110L to 120L).map(_ * 10).sum)
    val snap = Gvt.snapshot(dir)
    assert(snap.forall(_.min.contains("k")),
      "SQL inserts must produce zone-map stats on the declared columns")
  }

  test("INSERT OVERWRITE is one atomic truncate-and-load commit") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 100)")
    spark.sql(s"INSERT OVERWRITE $t SELECT id, id * 2 FROM range(0, 10)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 10)
    assert(spark.sql(s"SELECT sum(v) FROM $t").head.getLong(0) ==
      (0L until 10L).map(_ * 2).sum)
    // one commit: old state time-travels back
    assert(Gvt.read(spark, dir, Some(1)).count() == 100)
  }

  test("CTAS creates and loads in one statement") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES ('stats'='k') AS " +
      "SELECT id AS k, id * 3 AS v FROM range(0, 50)")
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $t").head.toSeq ==
      Seq(50L, (0L until 50L).map(_ * 3).sum))
    assert(Gvt.snapshot(dir).forall(_.min.contains("k")),
      "CTAS must inherit the stats property for its initial load")
  }

  test("CHECK constraints gate SQL inserts identically to API appends") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    Gvt.addCheck(spark, dir, "v_pos", "v >= 0")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $t SELECT id, id - 50 FROM range(0, 100)")
    }
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 0,
      "a violating SQL insert must commit NOTHING")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 10)
  }

  test("column mapping holds through the SQL surface") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    Gvt.renameColumn(spark, dir, "v", "value")
    // the SQL read serves the logical name; inserts speak it too
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq == Seq("k", "value"))
    spark.sql(s"INSERT INTO $t (k, value) SELECT id, id FROM range(10, 20)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 20)
    // physically the files still store the stable original name
    val live = Gvt.snapshot(dir)
    assert(spark.read.parquet(s"$dir/${live.last.path}")
      .columns.contains("v"))
  }

  test("warehouse-named tables: create, list, drop") {
    val wh = spark.conf.get("spark.sql.catalog.gvt.warehouse")
    val name = s"cat_spec_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE gvt.$name (k BIGINT) ")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$wh/$name/${Gvt.LogDir}")))
    spark.sql(s"INSERT INTO gvt.$name SELECT id FROM range(0, 5)")
    assert(spark.sql(s"SELECT count(*) FROM gvt.$name").head.getLong(0) == 5)
    assert(spark.sql(s"SHOW TABLES IN gvt").collect()
      .map(_.getString(1)).contains(name))
    spark.sql(s"DROP TABLE gvt.$name")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$wh/$name")))
    intercept[Exception] { spark.sql(s"SELECT * FROM gvt.$name").collect() }
  }

  test("DELETE FROM rides the CoW pipeline; TRUNCATE is one commit") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(0, 100)")
    spark.sql(s"DELETE FROM $t WHERE k >= 50 AND k < 70")
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $t").head.toSeq ==
      Seq(80L, ((0L until 50L) ++ (70L until 100L)).map(_ * 10).sum))
    // the delete is ONE commit; the old state time travels
    assert(Gvt.read(spark, dir, Some(1)).count() == 100)
    // file-granular CoW: only files containing matches were touched
    val head = Gvt.latestVersion(dir)
    assert(Gvt.commitAt(dir, head).removes.nonEmpty)
    spark.sql(s"TRUNCATE TABLE $t")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 0)
    assert(Gvt.read(spark, dir, Some(head)).count() == 80,
      "truncate must be a commit, not an erasure")
    // the emptied table accepts fresh loads
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 7)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 7)
  }

  test("DELETE FROM translates IN-lists and date/timestamp predicates") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, d DATE, ts TIMESTAMP) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "date_add(DATE '1995-01-01', CAST(id AS INT)), " +
      "timestamp_seconds(800000000 + id * 86400) FROM range(0, 100)")
    // IN-list (the #1 real delete shape after range predicates)
    spark.sql(s"DELETE FROM $t WHERE k IN (1, 3, 5, 7)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 96)
    // DATE literal comparison
    spark.sql(s"DELETE FROM $t WHERE d < DATE '1995-01-11'")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 90,
      "date-literal range delete must remove exactly the first 10 days' " +
        "survivors (0..9 minus the 4 already deleted = 6)")
    // TIMESTAMP literal comparison + foldable date arithmetic
    spark.sql(s"DELETE FROM $t WHERE ts >= TIMESTAMP '2005-01-01 00:00:00'")
    spark.sql(s"DELETE FROM $t WHERE d > date_add(DATE '1995-01-01', 95)")
    // NOT / OR / null-test composition
    spark.sql(s"DELETE FROM $t WHERE NOT (k < 90) OR k IS NULL")
    val left = spark.sql(s"SELECT k FROM $t ORDER BY k").collect().map(_.getLong(0))
    assert(left.forall(k => k >= 10 && k < 90 && !Set(1L,3L,5L,7L)(k)))
    // a non-foldable column function cannot translate: refuses loudly,
    // commits nothing
    val head = Gvt.latestVersion(dir)
    intercept[Exception] {
      spark.sql(s"DELETE FROM $t WHERE year(d) = 1995")
    }
    assert(Gvt.latestVersion(dir) == head,
      "an untranslatable DELETE must leave the table untouched")
  }

  test("ALTER TABLE: rename, drop, add column, check properties") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO value")
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq ==
      Seq("k", "value"))
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    // declared-but-unwritten column serves null through the catalog
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE note IS NULL")
      .head.getLong(0) == 10)
    spark.sql(s"INSERT INTO $t VALUES (100, 100, 'tagged')")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE note = 'tagged'")
      .head.getLong(0) == 1)
    spark.sql(s"ALTER TABLE $t DROP COLUMN note")
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq ==
      Seq("k", "value"))
    // constraints through TBLPROPERTIES
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('check.v_small'='value < 1000')")
    assert(Gvt.mappingAt(dir).checkMap.contains("v_small"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (1, 5000)")
    }
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('check.v_small')")
    spark.sql(s"INSERT INTO $t VALUES (1, 5000)")
    // unsupported shapes refuse loudly
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE STRING")
    }
  }

  test("creation is atomic; duplicate CREATE refuses") {
    val (_, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    intercept[Exception] { spark.sql(s"CREATE TABLE $t (k BIGINT)") }
  }

  test("UPDATE lowers onto updateWhere: one CoW commit, SQL semantics") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(0, 100)")
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k < 5")
    assert(spark.sql(s"SELECT sum(v) FROM $t").head.getLong(0) ==
      (0L until 100L).map(_ * 10).sum + 5)
    // ONE commit; the pre-update state time travels
    assert(Gvt.latestVersion(dir) == 2 &&
      Gvt.read(spark, dir, Some(1)).agg(sum("v")).head.getLong(0) ==
        (0L until 100L).map(_ * 10).sum)
    // SIMULTANEOUS assignment: the swap reads both originals
    spark.sql(s"UPDATE $t SET k = v, v = k WHERE k = 99")
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 990").head.getLong(0) == 99)
    // identity SETs and empty matches commit NOTHING
    val head = Gvt.latestVersion(dir)
    spark.sql(s"UPDATE $t SET v = v WHERE k < 5")
    spark.sql(s"UPDATE $t SET v = 0 WHERE k = -1")
    assert(Gvt.latestVersion(dir) == head,
      "no-op UPDATEs must not produce commits")
  }

  test("UPDATE speaks logical names on a column-mapped table") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    Gvt.renameColumn(spark, dir, "v", "value")
    spark.sql(s"UPDATE $t SET value = value * 2 WHERE k >= 5")
    assert(spark.sql(s"SELECT sum(value) FROM $t").head.getLong(0) ==
      (0L until 5L).sum + (5L until 10L).map(_ * 2).sum)
  }

  test("UPDATE refusals stay loud and commit nothing") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    val head = Gvt.latestVersion(dir)
    // subquery in WHERE and in SET: left for the stock loud error
    intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = 0 " +
        s"WHERE k IN (SELECT id FROM range(0, 3))")
    }
    intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = (SELECT max(id) FROM range(0, 3))")
    }
    assert(Gvt.latestVersion(dir) == head &&
      spark.sql(s"SELECT sum(v) FROM $t").head.getLong(0) ==
        (0L until 10L).sum,
      "refused UPDATEs must leave the table untouched")
    // CHECK constraints re-run against the updated rows
    Gvt.addCheck(spark, dir, "v_small", "v < 1000")
    intercept[Exception] { spark.sql(s"UPDATE $t SET v = 5000 WHERE k = 1") }
    assert(spark.sql(s"SELECT max(v) FROM $t").head.getLong(0) < 1000,
      "a constraint-violating UPDATE must commit NOTHING")
  }

  test("MERGE INTO lowers the canonical upsert onto Gvt.merge") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    spark.sql(s"MERGE INTO $t t USING " +
      "(SELECT id AS k, id * 100 AS v FROM range(5, 15)) s " +
      "ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val rows = spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect()
    assert(rows.length == 15)
    assert(rows.forall(r =>
      if (r.getLong(0) < 5) r.getLong(1) == r.getLong(0)
      else r.getLong(1) == r.getLong(0) * 100))
    // ONE commit for the whole upsert
    assert(Gvt.latestVersion(dir) == 2)
    // explicit column lists with agreeing images lower too
    spark.sql(s"MERGE INTO $t t USING " +
      "(SELECT id AS k, id AS v FROM range(20, 22)) s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 17)
  }

  test("MERGE refuses duplicate source keys (cardinality violation)") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    val head = Gvt.latestVersion(dir)
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO $t t USING " +
        "(SELECT id % 3 AS k, id AS v FROM range(0, 9)) s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e.getMessage.contains("duplicate"),
      s"expected the cardinality refusal, got: ${e.getMessage.take(200)}")
    assert(Gvt.latestVersion(dir) == head,
      "a refused MERGE must commit nothing")
  }

  test("non-canonical MERGE shapes refuse loudly and commit nothing") {
    val (dir, t) = pathTable()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")
    val head = Gvt.latestVersion(dir)
    // conditional matched action
    intercept[Exception] {
      spark.sql(s"MERGE INTO $t t USING " +
        "(SELECT id AS k, id AS v FROM range(0, 5)) s ON t.k = s.k " +
        "WHEN MATCHED AND s.v > 2 THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    }
    // DELETE action
    intercept[Exception] {
      spark.sql(s"MERGE INTO $t t USING " +
        "(SELECT id AS k, id AS v FROM range(0, 5)) s ON t.k = s.k " +
        "WHEN MATCHED THEN DELETE")
    }
    // differing matched/not-matched images
    intercept[Exception] {
      spark.sql(s"MERGE INTO $t t USING " +
        "(SELECT id AS k, id AS v FROM range(0, 5)) s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v + 1 " +
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    }
    // non-equi ON condition
    intercept[Exception] {
      spark.sql(s"MERGE INTO $t t USING " +
        "(SELECT id AS k, id AS v FROM range(0, 5)) s ON t.k >= s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(Gvt.latestVersion(dir) == head &&
      spark.sql(s"SELECT sum(v) FROM $t").head.getLong(0) ==
        (0L until 10L).sum,
      "refused MERGEs must leave the table untouched")
  }

  test("writes refuse through a version-pinned load") {
    val (dir, _) = pathTable()
    Gvt.append(spark, dir, Seq((1L, 2L)).toDF("k", "v"), Seq("k"))
    Gvt.append(spark, dir, Seq((2L, 3L)).toDF("k", "v"), Seq("k"))
    val e = intercept[Exception] {
      Seq((9L, 9L)).toDF("k", "v").write.format("gvt")
        .option("path", dir).option("versionAsOf", "0")
        .mode("append").save()
    }
    assert(e.getMessage.contains("version-pinned"))
    // and the plain head write path works
    Seq((9L, 9L)).toDF("k", "v").write.format("gvt")
      .option("path", dir).mode("append").save()
    assert(Gvt.read(spark, dir).count() == 3)
  }
}
