package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole forked test JVM — per-suite sessions
  * would dominate test wall time. Config mirrors Verify/Bench.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf — needed by LayoutSpec's saveAsTable bucketing test
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  // Larger scales, used only by the drift tripwire (TestdataSchemaSpec):
  // hoisted here so a testdata relocation is a one-line change, visibly
  // distinct from real schema drift.
  val sf001 = "/root/testdata/sf0.01"
  val sf01  = "/root/testdata/sf0.1"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf0001
}
