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
    // The session-grain frame feeds both the quota aggregate and the
    // final rank — persist it (pruned to the columns both branches
    // need) so its (sessionize + aggregate) lineage runs once, not
    // once per branch. Session grain is orders of magnitude smaller
    // than the event input; disk-backed for safety.
    val keyed = sessions
      .select(col("session_id"), col("start_time"), col("event_types"))
      .withColumn("date", substring(col("start_time"), 1, 10))
      .withColumn("date_hour",
        concat(substring(col("start_time"), 1, 10), lit("_"),
          substring(col("start_time"), 12, 2)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Quota table: strata counts are aggregate-grain (days × 24 rows)
    // — partial aggregation shuffles only (key, count) pairs, and the
    // quota frame broadcast-joins back. The session frame itself is
    // shuffled exactly ONCE (the per-stratum rank window). Day totals
    // and the day count are derived from the tiny strata frame inside
    // ONE single-partition window stage (coalesce(1) plans as
    // SinglePartition, so neither window adds an exchange) instead of
    // a days-aggregate + count-aggregate + cross-join chain — three
    // fewer sequential stages on kilobyte-sized data.
    val wholeFrame = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = keyed.groupBy(col("date"), col("date_hour"))
      .agg(count(lit(1)).as("hour_count"))
      .coalesce(1)
      .withColumn("day_count",
        sum(col("hour_count")).over(Window.partitionBy(col("date"))))
      .withColumn("n_days",
        size(collect_set(col("date")).over(wholeFrame)).cast("long"))
      .withColumn("per_day", expr(s"$target div n_days"))
      .withColumn("hour_quota", expr("(hour_count * per_day) div day_count"))
      .select(col("date_hour"), col("hour_quota"))

    val wHour = Window.partitionBy(col("date_hour"))
    keyed
      .join(broadcast(quotas), "date_hour")
      .withColumn("draw", md5(col("session_id").cast("binary")))
      .withColumn("pick",
        row_number().over(wHour.orderBy(col("draw"), col("session_id"))))
      .filter(col("pick") <= col("hour_quota"))
      .select(col("date_hour"), col("session_id"), col("start_time"),
        col("event_types"))
  }
}
