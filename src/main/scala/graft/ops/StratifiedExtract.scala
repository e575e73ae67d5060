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

  /** Neyman-optimal stratified sample allocation (Neyman 1934): split
    * a sampling `budget` across strata proportionally to N_h·σ_h —
    * the allocation that minimizes the variance of the stratified
    * mean estimator, vs [[apply]]'s size-proportional quotas. The
    * design table a 100 TB sampling job computes FIRST (stratum
    * grain, metadata-sized) before drawing a single row.
    *
    * All integer, no libm (house determinism rules):
    *  - N_h·σ_h = √(N_h·Σx² − (Σx)²) exactly, because the variance
    *    numerator IS (N_h·σ_h)² — so the weight needs ONE integer
    *    sqrt and no division;
    *  - sums are decimal(38,0) (cents² overflow Long far below real
    *    stratum sizes); isqrt = IEEE sqrt seeded, then a ±2 exact
    *    decimal correction — exact while varnum < 2^104 ≈ 2e31 (seed
    *    error < 2 there; beyond that, Newton-iterate);
    *  - integer quotas by the largest-remainder method (floor shares,
    *    leftovers to the largest B·w − base·W remainders, stratum-asc
    *    tie-break), so Σ alloc = budget exactly.
    *  - zero-variance degenerate case (W = 0): uniform weights.
    *
    * Scale shape: one fact pass → stratum-grain stats; everything
    * after runs on ≤|strata| rows inside one coalesce(1) stage (the
    * [[apply]] quota-table pattern). Columns: stratum, n_rows,
    * ney_weight, alloc. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      centsCol: String, budget: Long): DataFrame = {
    require(budget >= 0L, "budget must be >= 0")
    val dec = "decimal(38,0)"
    val stats = df
      .filter(col(stratumCol).isNotNull && col(centsCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(centsCol).cast(dec)).as("s"),
        sum((col(centsCol) * col(centsCol)).cast(dec)).as("q"))
      .withColumn("varnum",
        (col("n_rows").cast(dec) * col("q") - col("s") * col("s")))
    val wholeFrame = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    stats
      // isqrt: IEEE seed, then exact ±2 decimal correction
      .withColumn("y0",
        floor(sqrt(col("varnum").cast("double"))).cast("long"))
      .withColumn("yu", expr(
        s"""CASE WHEN CAST(y0 + 2L AS $dec) * CAST(y0 + 2L AS $dec) <= varnum THEN y0 + 2L
           |     WHEN CAST(y0 + 1L AS $dec) * CAST(y0 + 1L AS $dec) <= varnum THEN y0 + 1L
           |     ELSE y0 END""".stripMargin))
      .withColumn("w", expr(
        s"""CASE WHEN CAST(yu AS $dec) * CAST(yu AS $dec) <= varnum THEN yu
           |     WHEN CAST(yu - 1L AS $dec) * CAST(yu - 1L AS $dec) <= varnum THEN yu - 1L
           |     ELSE yu - 2L END""".stripMargin))
      .coalesce(1)
      .withColumn("tot_w", sum(col("w").cast(dec)).over(wholeFrame))
      .withColumn("n_strata", count(lit(1)).over(wholeFrame))
      // degenerate all-zero-variance design → uniform weights
      .withColumn("w2", when(col("tot_w") === lit(0L).cast(dec), lit(1L))
        .otherwise(col("w")))
      .withColumn("tw2", when(col("tot_w") === lit(0L).cast(dec),
        col("n_strata").cast(dec)).otherwise(col("tot_w")))
      .withColumn("base", expr(
        s"CAST(CAST(${budget}L AS $dec) * CAST(w2 AS $dec) / tw2 AS $dec)")
        .cast("long"))
      .withColumn("base", expr(
        s"""CASE WHEN (CAST(base AS $dec) * tw2) <= CAST(${budget}L AS $dec) * CAST(w2 AS $dec)
           |     THEN base ELSE base - 1L END""".stripMargin))
      .withColumn("rem",
        expr(s"CAST(${budget}L AS $dec) * CAST(w2 AS $dec) - CAST(base AS $dec) * tw2"))
      .withColumn("leftover",
        lit(budget) - sum(col("base")).over(wholeFrame))
      .withColumn("rk", row_number().over(Window.orderBy(
        col("rem").desc, col("stratum").asc)))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("stratum"), col("n_rows"), col("w").as("ney_weight"),
        col("alloc"))
      .orderBy(col("stratum").asc)
  }
}
