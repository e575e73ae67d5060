package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.tables.Tables

/** Salted set-valued aggregation equals the direct formulation. */
class SkewSpec extends SparkSpec {

  test("saltedDistinctConcat == direct collect_set concat on skewed data") {
    // orders keyed by priority: few keys, many rows — the hot-group shape
    val ord = Tables(spark, sf, "orders")
      .select(col("o_orderpriority").as("k"), col("o_custkey").cast("string").as("v"))
    val direct = ord.groupBy(col("k"))
      .agg(concat_ws(",", array_sort(collect_set(col("v")))).as("cs"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val salted = Skew.saltedDistinctConcat(ord, Seq("k"), col("v"), "cs")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(salted == direct)
    assert(direct.nonEmpty)
  }

  test("salted phase-1 splits a hot group across salt partitions") {
    val ord = Tables(spark, sf, "orders")
      .select(col("o_orderpriority").as("k"), col("o_custkey").cast("string").as("v"))
    val saltCounts = ord
      .withColumn("__salt", Skew.saltOf(col("v")))
      .groupBy(col("k")).agg(countDistinct(col("__salt")).as("n"))
      .collect().map(_.getLong(1))
    assert(saltCounts.forall(_ > 1), "hot groups should spread over multiple salts")
  }
}
