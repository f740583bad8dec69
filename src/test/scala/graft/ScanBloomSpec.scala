package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Evidence test for `scan_parquet_bloom`: the bloom filter must cause
  * ROW-GROUP SKIPPING the scan can't get any other way on this layout
  * (file sorted by o_orderkey ⇒ o_custkey zone maps span everything;
  * dictionary filtering disabled at write time). The assertion compares
  * the scan operator's actual output rows on two stagings of identical
  * data and an identical point probe — bloom on vs bloom off — so it
  * measures the skip, not the filter.
  */
class ScanBloomSpec extends GraftSuite {

  private def scannedRows(df: DataFrame): Long = {
    df.collect() // execute so metrics populate
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("bloom filter skips row groups a zone map can't") {
    val probe = 42L
    def scanOf(bloom: Boolean): DataFrame =
      spark.read.parquet(operators.Scans.bloomStage(spark, sf001, bloom))
        .filter(col("o_custkey") === probe)
    val withBloom = scannedRows(scanOf(bloom = true))
    val withoutBloom = scannedRows(scanOf(bloom = false))
    val answer = scanOf(bloom = true).count()
    assert(answer > 0, "probe key must exist — vacuous otherwise")
    // without bloom, every row group survives row-group pruning (zone
    // maps are useless for a scattered column) and the scan emits far
    // more rows than the answer; with bloom, most groups are ruled out
    assert(withBloom < withoutBloom,
      s"bloom scan read $withBloom rows, bloom-less read $withoutBloom — " +
        "no row-group skipping happened")
    // the skip floor is physical: the scan must still read every row
    // group that CONTAINS a match (4 matching rows at sf0.01 ⇒ ≤4
    // groups), so the achievable ratio is groups-total / groups-hit —
    // ≥4x with the 16 KiB row groups staged above, asserted at 3x for
    // headroom against row-group boundary placement of the matches
    assert(withBloom * 3 <= withoutBloom,
      s"expected ≥3x fewer rows scanned with bloom " +
        s"($withBloom vs $withoutBloom)")
  }

  test("the declared key answers the probe correctly") {
    val rows = operators.Scans.parquetBloom(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) == 42L))
  }
}
