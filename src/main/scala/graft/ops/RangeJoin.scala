package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless time-range join: for each probe row, the build rows whose
  * timestamp falls in the trailing window `[probe.ts - w, probe.ts)`.
  * No equi key relates the sides (unlike [[AsOfJoin]], which is
  * per-key), so a naive join is a cartesian product with a range
  * filter — Spark plans BroadcastNestedLoopJoin and dies at scale.
  *
  * The standard fix is TIME BUCKETING: bucket width = window width,
  * build rows land in bucket floor(ts/w), probe rows EXPLODE to their
  * bucket and its predecessor (a trailing window of width w spans at
  * most two such buckets). The join becomes an equi-join on the
  * bucket id (one shuffle each side, probe side 2×), and the exact
  * range predicate filters the co-bucketed candidates. Pair work is
  * bounded by per-bucket density — the data's own events-per-window
  * rate — instead of |probe| × |build|.
  *
  * Skew: a flash-crowd bucket concentrates pairs; AQE's skew-join
  * split handles the shuffle side, and the aggregate that follows is
  * per-probe-row, so no single reducer sees more than one probe's
  * window.
  */
object RangeJoin {

  /** Matched (probe × build) pairs for the trailing window. `probe`
    * must carry a `ts` column plus id/payload columns; `build` must
    * carry `ts` plus payload (no name overlaps with probe except
    * `ts`, which is renamed `build_ts` on the build side). */
  def pairsInWindow(probe: DataFrame, build: DataFrame,
      windowSecs: Long): DataFrame = {
    require(windowSecs >= 1, "windowSecs must be >= 1")
    val wUs = windowSecs * 1000000L
    val p = probe
      .withColumn("__pus", unix_micros(col("ts")))
      .withColumn("__bucket",
        explode(array((floor(col("__pus") / wUs) - 1).cast("long"),
          floor(col("__pus") / wUs).cast("long"))))
    val b = build
      .withColumnRenamed("ts", "build_ts")
      .withColumn("__bus", unix_micros(col("build_ts")))
      .withColumn("__bucket", floor(col("__bus") / wUs).cast("long"))
    p.join(b, Seq("__bucket"))
      .filter(col("__bus") >= col("__pus") - wUs && col("__bus") < col("__pus"))
      .drop("__bucket", "__pus", "__bus")
  }

  /** q51 shape: per click, the count and cents total of ALL purchases
    * site-wide in the preceding `windowSecs` (left semantics — clicks
    * with an empty window report zeros). */
  def purchasesBeforeClicks(events: DataFrame, windowSecs: Long = 3600L): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_event_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("ts"), floor(col("value") * lit(100.0)).cast("long").as("cents"))
    val matched = pairsInWindow(clicks, purchases, windowSecs)
      .groupBy(col("click_event_id"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents_sum"))
    clicks.select(col("click_event_id"))
      .join(matched, Seq("click_event_id"), "left")
      .select(col("click_event_id"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("cents_sum"), lit(0L)).as("purchase_cents"))
  }
}
