package graft

import org.apache.spark.sql.functions._

/** Wave-12 operators: file-layout and metrics assertions beyond the
  * oracle hash checks.
  */
class Wave12Spec extends GraftSuite {

  test("tuned parquet sink: zstd codec and bounded row groups in footers") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val df = operators.Scans.parquetTuned(spark, sf001)
    assert(df.count() == 15000)
    val file = df.inputFiles.head
    val in = HadoopInputFile.fromPath(new Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try {
      val groups = reader.getFooter.getBlocks
      val codec = groups.get(0).getColumns.get(0).getCodec.toString
      assert(codec == "ZSTD", codec)
      // 256 KB block size over ~7.5k rows/file must split into >1 group
      assert(groups.size() > 1, s"row groups: ${groups.size()}")
    } finally reader.close()
  }

  test("observation metrics equal a direct aggregation") {
    val m = operators.Aggregates.observeMetrics(spark, sf0001).head
    val d = Tables(spark, sf0001, "lineitem")
      .agg(count(lit(1)), max("l_orderkey")).head
    assert(m.getLong(0) == d.getLong(0))
    assert(m.getLong(2) == d.getLong(1))
  }

  test("union by name null-fills the missing column, not misaligns") {
    val u = operators.SortsSetOps.unionByName(spark, sf0001)
    assert(u.schema.fieldNames.toSeq ==
      Seq("c_custkey", "c_name", "c_mktsegment"))
    val even = u.filter(col("c_custkey") % 2 === 0)
    assert(even.filter(col("c_mktsegment").isNotNull).count() == 0)
    val odd = u.filter(col("c_custkey") % 2 =!= 0)
    assert(odd.filter(col("c_mktsegment").isNull).count() == 0)
  }

  test("ddl defaults fill omitted columns and DEFAULT literals") {
    val t = operators.SqlSurface.ddlDefaults(spark, sf0001).collect()
    assert(t.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "NEW", 10), (2L, "NEW", 10), (3L, "DONE", 10),
        (4L, "NEW", 99)))
  }

  test("pipe syntax optimizes to the keyword form's plan (same rows, pushed filter)") {
    val piped = operators.SqlSurface.pipeSyntax(spark, sf0001)
    // the keyword form IS the declared oracle — derive it from the
    // oracle map (table name aside) so the two can never drift apart
    val keyword = spark.sql(operators.SqlSurface
      .oracle("sql_pipe_syntax")
      .replace("FROM lineitem ", "FROM lineitem_v "))
    assert(piped.collect().toSeq == keyword.collect().toSeq)
    // the pipe stages parse into ordinary operators — the shipdate
    // filter must reach the scan exactly like the keyword form (no
    // filter-ORDER assumption; pushed-filter ordering is not a contract)
    val plan = piped.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$plan")
  }
}
