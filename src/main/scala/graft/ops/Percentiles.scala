package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based exact quantiles and multi-level aggregates — capability
  * extensions beyond the reference (which has no percentile, rollup,
  * or approx-distinct anywhere; SURVEY §2.4), shaped for scale.
  *
  * Median is computed rank-based (row_number vs count over the group
  * window) rather than via `percentile`, for two reasons: the
  * arithmetic is integer-exact and engine-portable (hash-checkable
  * against DuckDB — interpolating percentile implementations differ in
  * final-ulp float details), and the plan is one shuffle on the group
  * key.
  */
object Percentiles {

  /** Exact per-group median of `valueCol` in integer cents: the mean
    * of the two middle values (even n) or the middle value (odd n).
    * row_number over a non-unique value order is rank-nondeterministic
    * among ties, but the VALUE occupying each rank is deterministic —
    * which is all the median needs. */
  def medianCents(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(valueCol))
      .withColumn("rn", row_number().over(w.orderBy(col(valueCol).asc)))
      .withColumn("n", count(lit(1)).over(w))
    // middle ranks: (n+1) div 2 and (n+2) div 2 — equal when n is odd
    ranked
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(n + 2) div 2"))
      .groupBy(col(groupCol))
      .agg(floor(avg(col(valueCol).cast("double")) * 100).cast("long")
        .as("median_cents"),
        min(col("n")).as("n_rows"))
  }

  /** Multi-level totals via ROLLUP — per (a,b), per a, and grand
    * total in ONE pass (partial aggregation covers all levels;
    * grouping_id disambiguates). */
  def rollupTotals(df: DataFrame, a: String, b: String, valueCol: String): DataFrame =
    df.rollup(col(a), col(b))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total"))
      .select(
        coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("n_rows"), col("total"))

  /** HyperLogLog++ approximate distinct — the count-distinct that
    * scales (fixed-size sketch per group, mergeable map-side; exact
    * distinct shuffles every value). rsd 1.5% ≈ 12KB sketches. */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.015): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))
}
