package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    // match the Bench/Verify session tuning: keep bounded-set
    // collect_set aggregates hash-based instead of sort-falling-back
    // after 128 groups (see Bench.scala for the sizing rationale)
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // per-JVM temp warehouse: managed-table locations (bucketing tests)
    // never collide with a previous run's leftovers
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
  def sf0001: String =
    sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf0001
}
