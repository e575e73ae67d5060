package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session assignment + session-grain aggregation.
  *
  * Reference semantics: UserVisitSessionAnalyzeSpark.java:340-455 (A1 in
  * SURVEY.md §2.4) groups a clickstream by a session key and computes
  * per-session visit length (max-min action time, seconds), step length
  * (action count) and distinct-concat of categorical columns. The
  * reference's sessions are pre-assigned in the data; over the driver's
  * `events` table we additionally *derive* the session key with the
  * standard 30-minute-inactivity-gap rule, entirely with window
  * functions (no RDD groupByKey — stays in Catalyst, shuffles once on
  * user_id and reuses that partitioning for both the lag and the
  * running sum).
  *
  * Scale notes: the only shuffle is the window partitioning by
  * user_id. At 100 TB the user_id key space is huge (no skew beyond a
  * bot user); sessionization is embarrassingly parallel per user.
  */
object Sessionize {

  /** Assign gap-based session ids: a new session starts when the time
    * since the user's previous event exceeds `gapSeconds`.
    * Output = input columns + session_id (user_id_seq), ts_us.
    */
  def assignSessions(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(run))
      .withColumn(
        "session_id",
        concat(col("user_id").cast("string"), lit("_"), col("session_seq").cast("string")))
      .drop("prev_us", "is_new")
  }

  /** A1: session-grain aggregate. One hash-aggregate over the
    * already-user-partitioned sessionized frame (partial agg map-side).
    *
    * Columns: session_id, user_id, step_length, visit_length_s,
    * start_time (string, reference's yyyy-MM-dd HH:mm:ss format),
    * event_types (sorted distinct concat — the reference's
    * substring-dedup concat is a documented bug we don't replicate,
    * SURVEY.md §7.3), total_value_cents (house money convention:
    * per-event floor(value*100) cents summed as BIGINT — IEEE
    * multiply+floor is bit-identical across engines, unlike
    * double→decimal rounding).
    */
  def sessionAggregates(sessionized: DataFrame): DataFrame =
    sessionized
      .groupBy(col("session_id"), col("user_id"))
      .agg(
        count(lit(1)).as("step_length"),
        expr("(max(ts_us) - min(ts_us)) div 1000000").as("visit_length_s"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_time"),
        concat_ws(",", array_sort(collect_set(col("event_type")))).as("event_types"),
        sum(floor(col("value") * lit(100.0))).as("total_value_cents"))

  /** Convenience: events -> session aggregates. */
  def apply(events: DataFrame, gapSeconds: Long = 1800L): DataFrame =
    sessionAggregates(assignSessions(events, gapSeconds))
}
