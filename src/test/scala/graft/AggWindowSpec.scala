package graft

import org.apache.spark.sql.functions._

/** Semantic checks for §2.4/§2.5 beyond the DuckDB oracle. */
class AggWindowSpec extends GraftSuite {

  test("approx_count_distinct within 10% of exact per event_type") {
    operators.Aggregates.approxDistinct(spark, sf001).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("rollup grand total equals sum of region subtotals") {
    val rows = operators.Aggregates.rollup(spark, sf0001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val regionSubs = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val grandRev = grand.head.getAs[Double]("revenue")
    val subSum = regionSubs.map(_.getAs[Double]("revenue")).sum
    assert(math.abs(grandRev - subSum) < 1e-4)
  }

  test("cube has all four grouping levels") {
    val rows = operators.Aggregates.cube(spark, sf0001).collect()
    def level(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) 1 else 0, if (r.isNullAt(1)) 1 else 0)
    val levels = rows.map(level).toSet
    assert(levels == Set((0, 0), (0, 1), (1, 0), (1, 1)))
  }

  test("pivot row count equals number of distinct days") {
    val days = Tables(spark, sf0001, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    assert(operators.Aggregates.pivot(spark, sf0001).count() == days)
  }

  test("unpivot triples the row count") {
    val n = Tables(spark, sf0001, "lineitem").count()
    assert(operators.Aggregates.unpivot(spark, sf0001).count() == 3 * n)
  }

  test("win_rank_topn returns at most 3 rows per customer, rank contiguous") {
    val df = operators.Windows.rankTopN(spark, sf0001)
    val bad = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
      .filter(col("n") > 3 || col("maxrn") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("running total is monotone per customer") {
    val df = operators.Windows.running(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("running_n")
    val bad = df.withColumn("prev", lag("running_total", 1).over(w))
      .filter(col("prev").isNotNull && col("running_total") < col("prev"))
    assert(bad.count() == 0)
  }

  test("frame_rows window never exceeds 3 rows") {
    val df = operators.Windows.frameRows(spark, sf0001)
    assert(df.filter(col("rolling3_n") > 3 || col("rolling3_n") < 1).count() == 0)
  }
}
