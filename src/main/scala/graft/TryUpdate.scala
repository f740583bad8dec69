package graft
import org.apache.spark.sql.functions._
object TryUpdate {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", "ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gvt-upd-").toString + "/t"
    sources.Gvt.append(spark, dir, (0L until 10L).map(k => (k, k)).toDF("k","v"), Seq("k"))
    try spark.sql(s"UPDATE gvt.`$dir` SET v = v + 1 WHERE k < 5").show()
    catch { case e: Throwable => println("UPDATE ERR " + e.getClass.getName + ": " + e.getMessage.take(300)) }
    try spark.sql(s"MERGE INTO gvt.`$dir` t USING (SELECT id AS k, id*2 AS v FROM range(5,15)) s ON t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").show()
    catch { case e: Throwable => println("MERGE ERR " + e.getClass.getName + ": " + e.getMessage.take(300)) }
    spark.stop()
  }
}
