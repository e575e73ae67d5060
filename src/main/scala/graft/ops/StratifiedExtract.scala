package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R1: time-proportional stratified random session extraction.
  *
  * Reference: UserVisitSessionAnalyzeSpark.java:985-1253 — counts per
  * (day, hour) stratum are collected to the DRIVER, per-stratum quotas
  * and random index lists are built in driver maps, broadcast back,
  * and a groupByKey+flatMap keeps rows by in-group ordinal. That
  * design caps out when the stratum map outgrows the driver.
  *
  * Spark-first, fully distributed, deterministic:
  *  - quotas via window counts (no driver round-trip, no broadcast);
  *  - "random" order via md5(session_id) — a stable pseudo-random
  *    permutation, reproducible on any cluster layout (rand(seed) is
  *    partition-layout-dependent; md5 is not) and oracle-checkable;
  *  - quota arithmetic in integers: perDay = target div nDays,
  *    hourQuota = (hourCount * perDay) div dayCount (implicitly capped
  *    by stratum size since rank ≤ count always).
  */
object StratifiedExtract {

  /** @param sessions session aggregates (needs session_id, start_time,
    *                 event_types)
    * @param target   total sessions to draw (reference: 100/task) */
  def apply(sessions: DataFrame, target: Long = 100L): DataFrame = {
    val keyed = sessions
      .withColumn("date", substring(col("start_time"), 1, 10))
      .withColumn("date_hour",
        concat(substring(col("start_time"), 1, 10), lit("_"),
          substring(col("start_time"), 12, 2)))

    val nDays = keyed.agg(countDistinct(col("date")).as("n_days"))

    val wHour = Window.partitionBy(col("date_hour"))
    val wDay = Window.partitionBy(col("date"))
    val ranked = keyed
      .crossJoin(nDays) // 1 row — broadcast by Catalyst
      .withColumn("hour_count", count(lit(1)).over(wHour))
      .withColumn("day_count", count(lit(1)).over(wDay))
      .withColumn("per_day", expr(s"$target div n_days"))
      .withColumn("hour_quota", expr("(hour_count * per_day) div day_count"))
      .withColumn("draw", md5(col("session_id").cast("binary")))
      .withColumn("pick",
        row_number().over(wHour.orderBy(col("draw"), col("session_id"))))

    ranked.filter(col("pick") <= col("hour_quota"))
      .select(col("date_hour"), col("session_id"), col("start_time"),
        col("event_types"))
  }
}
