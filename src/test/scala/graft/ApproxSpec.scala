package graft

import org.apache.spark.sql.functions.{col, countDistinct}

/** Aggregation extensions: approx-distinct accuracy bound. */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact at rsd 1.5%") {
    val ord = graft.tables.Tables(spark, sf, "orders")
    val exact = ord.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Percentiles.approxDistinct(ord, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("approx median tracks the exact histogram median per group") {
    val li = graft.tables.Tables(spark, sf, "lineitem")
    val exact = graft.ops.Percentiles.medianCents(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Percentiles.approxMedianCents(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // sketch quantile definitions differ from the rank-midpoint by at
      // most one value step on a discrete domain; quantity steps are
      // whole units (100 cents)
      assert(math.abs(a - e) <= 100, s"$k: approx $a vs exact $e")
    }
  }
}
