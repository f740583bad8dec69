package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM — sbt forks one
  * test JVM, so every suite reuses this session).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    // same shared conf set as Verify/Bench (graft.Sessions) so tests
    // validate keys under the config they ship with
    val s = Sessions.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Sessions.install(s)
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sf0001: String = SparkTestBase.sf0001
  def sf001: String = SparkTestBase.sf001
}
