package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the canonical user-behavior analytics rollup
  * the reference's session module feeds in production: users grouped
  * by first-seen day (their cohort), counted on each later day they
  * return, bounded to a `maxOffsetDays` horizon.
  *
  * Scale shape: ONE fact shuffle. The per-user active-day SET is
  * built in a single user-grain aggregate (map-side partial
  * aggregation dedups (user, day) before the shuffle; the set is
  * horizon-bounded — ≤ maxOffset+analysis-window days, bytes not
  * megabytes), the cohort day is its array_min, and the explode back
  * to (user, day) grain is a map stage. After the explode every
  * (user, offset) row is unique by construction, so the final
  * (cohort, offset) count needs no distinct aggregation — the second
  * shuffle is cohort×offset-grain, metadata-sized. The naive
  * formulation (distinct → min-join → countDistinct) shuffles the
  * fact table three times.
  */
object Retention {

  def cohortRetention(events: DataFrame, maxOffsetDays: Int = 14): DataFrame =
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("d")).as("ds"))
      .select(col("user_id"), array_min(col("ds")).as("cohort_d"),
        explode(col("ds")).as("d"))
      .withColumn("offset_days", datediff(col("d"), col("cohort_d")).cast("long"))
      .filter(col("offset_days") <= maxOffsetDays)
      .groupBy(col("cohort_d"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_date"),
        col("offset_days"), col("n_users"))
}
