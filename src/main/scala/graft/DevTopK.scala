package graft


/** Dev-only: smoke the native top-k operator (plan + result diff vs the
  * window form).
  */
object DevTopK {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val dir = "/root/testdata/sf0.01"
    val df = plans.TopK.topkNative(spark, dir)
    df.explain("formatted")
    println("rows=" + df.count())
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .drop("rk")
    println("diff=" + df.exceptAll(ref).count() + "," + ref.exceptAll(df).count())
    spark.stop()
  }
}
