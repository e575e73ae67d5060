package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation analytics over the event stream: deterministic
  * hash-bucket arm assignment (the house md5-draw convention — the
  * same user lands in the same arm on every run and every cluster
  * layout, which IS how production bucketing works), the
  * sample-ratio-mismatch health check every experiment platform runs
  * before reading any metric, and the per-arm conversion lift table.
  *
  * Both reports collapse to ARM grain (≤ a handful of rows) in one
  * user-grain pass; no libm (deviations are integer bp compares).
  */
object Experiment {

  /** Deterministic arm for a user id: md5-draw mod 100 < splitPct →
    * "A" else "B" (the q81/q107 draw convention at the user key).
    * Shared with [[graft.streaming.SrmStream]] — the live monitor must
    * bucket EXACTLY like the batch check or parity is meaningless. */
  private[graft] def armCol(userCol: String, splitPct: Int): Column =
    when(expr(s"CAST(conv(substring(md5(CAST($userCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
      < splitPct, lit("A")).otherwise(lit("B"))

  /** Sample-ratio-mismatch check: observed vs declared arm shares
    * over DISTINCT users (events-per-user must not bias the ratio),
    * deviation in bp, and a flag when it exceeds `toleranceBp` — the
    * stop-the-experiment signal (an SRM means assignment or logging
    * is broken; metrics read from it are garbage). */
  def srmCheck(events: DataFrame, splitPct: Int = 50,
      toleranceBp: Long = 300L): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val wAll = Window.partitionBy()
    events
      .select(col("user_id")).distinct()
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("expected_bp",
        when(col("arm") === "A", lit(splitPct * 100L))
          .otherwise(lit((100 - splitPct) * 100L)))
      .withColumn("observed_bp",
        floor(lit(10000.0) * col("n_users") /
          sum(col("n_users")).over(wAll)).cast("long"))
      .withColumn("dev_bp", abs(col("observed_bp") - col("expected_bp")))
      .withColumn("srm_flag", (col("dev_bp") > toleranceBp).cast("int"))
  }

  /** Per-arm conversion report: users, converters (≥1 `convType`
    * event), conversion rate, and each arm's delta vs the pooled
    * rate (integer bp; the reader derives A−B from two rows — the
    * report stays arm-grain so k-arm experiments need no schema
    * change). */
  def abLift(events: DataFrame, splitPct: Int = 50,
      convType: String = "purchase"): DataFrame = {
    val wAll = Window.partitionBy()
    events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("converted"))
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_bp",
        floor(lit(10000.0) * col("n_converted") / col("n_users")).cast("long"))
      .withColumn("pooled_bp",
        floor(lit(10000.0) * sum(col("n_converted")).over(wAll) /
          sum(col("n_users")).over(wAll)).cast("long"))
      .withColumn("delta_bp", col("conv_bp") - col("pooled_bp"))
  }
}
