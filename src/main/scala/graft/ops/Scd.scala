package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) build + point-in-time read —
  * the dimension-versioning pattern every warehouse needs and the
  * reference's MySQL dimensions silently don't have (its task/user
  * tables are overwritten in place, SURVEY.md §1.3: history is lost
  * the moment a row changes). Here the user's loyalty TIER is derived
  * from their cumulative purchase count and kept as effective-dated
  * versions: (user_id, tier, valid_from_us, valid_to_us], the
  * classic Kimball type-2 shape.
  *
  * Build: tier = #thresholds crossed by the running purchase count —
  * nondecreasing by construction, so a version row is emitted exactly
  * when the tier FIRST changes (the user's first event opens tier 0's
  * version; `valid_to_us` = next version's start − 1 µs, NULL for the
  * live version). Two purchases on one timestamp can open a
  * degenerate zero-width version (valid_to < valid_from); it is kept
  * — it records the crossing — and the point-in-time read resolves
  * the tie to the HIGHEST tier at that instant.
  *
  * Read: [[AsOfJoin.leftAsOf]] with the tier as tie-break — build
  * rows sort before probes at equal ts, so a purchase that itself
  * opens a tier is read in its NEW tier. The revenue-by-tier report
  * is the standard SCD consumer ("was this order placed by a gold or
  * a bronze member AT THE TIME").
  *
  * Scale shape: the history build is one user-keyed window pass (the
  * sessionize shuffle shape — running sum, lag, filter, lead all ride
  * one hash partition by subset clustering); the PIT read is the
  * as-of union+window (one shuffle of probe+build, no range blowup);
  * the report collapses to tier grain (≤|thresholds|+1 rows).
  */
object Scd {

  val TierThresholds: Seq[Long] = Seq(3L, 10L, 30L)

  private def tierOf(cum: Column, thresholds: Seq[Long]): Column =
    thresholds.map(t => (cum >= t).cast("int")).reduce(_ + _)

  /** The type-2 history: (user_id, tier, valid_from_us,
    * valid_to_us). One version row per tier change. */
  def tierHistory(events: DataFrame,
      thresholds: Seq[Long] = TierThresholds): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.distinct == thresholds, "thresholds ascending, distinct")
    val ordered = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // tier is nondecreasing (cum is), so within a user the version
    // order (valid_from_us, tier) matches event order even when two
    // crossings share a timestamp.
    val versions = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("tier"))
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("cum", sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).over(run))
      .withColumn("tier", tierOf(col("cum"), thresholds))
      .withColumn("prev_tier", lag(col("tier"), 1).over(ordered))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
      .select(col("user_id"), col("tier"), col("ts_us").as("valid_from_us"))
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(versions) - 1L)
  }

  /** Month-end tier census — the SNAPSHOT consumer of [[tierHistory]]
    * (the other classic SCD read next to [[revenueByTier]]'s as-of):
    * for every month-end inside the observed event span, how many
    * users sat in each tier AT THAT INSTANT. This is the table a
    * "loyalty program growth" dashboard plots; without the type-2
    * history it cannot be built at all (the current-state dimension
    * only answers "now").
    *
    * Cuts are every month-end inside the span PLUS the span's last
    * observed day (the "as of now" snapshot — without it a panel
    * whose data ends mid-month reports nothing). The cut instant is
    * the last microsecond of the cut day. Versions match cuts by
    * interval containment; an open version (NULL valid_to) covers
    * every later cut.
    *
    * Scale shape: the cut list is calendar metadata (≤ span months,
    * bounds from one ts-only pruned pass over events — version starts
    * can't see the span's quiet tail); cuts broadcast against
    * version-grain rows (fan-out ≤ covered months per version); the
    * census lands at (snapshot, tier) grain. */
  def monthEndCensus(events: DataFrame,
      thresholds: Seq[Long] = TierThresholds): DataFrame = {
    val hist = tierHistory(events, thresholds).persist()
    val cuts = events
      .filter(col("ts").isNotNull)
      .agg(expr("min(unix_micros(ts)) div 86400000000").as("mnd"),
        expr("max(unix_micros(ts)) div 86400000000").as("mxd"))
      .select(col("mxd"), explode(expr("sequence(mnd, mxd)")).as("daynum"))
      .withColumn("d", expr("date_add('1970-01-01', CAST(daynum AS INT))"))
      .filter(expr("last_day(d) = d") || col("daynum") === col("mxd"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("snapshot_day"),
        ((col("daynum") + 1L) * 86400000000L - 1L).as("cut_us"))
    hist
      .join(broadcast(cuts),
        col("valid_from_us") <= col("cut_us") &&
          (col("valid_to_us").isNull || col("valid_to_us") >= col("cut_us")))
      .groupBy(col("snapshot_day"), col("tier"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("snapshot_day").asc, col("tier").asc)
  }

  /** Point-in-time revenue by tier: every purchase read against the
    * tier version in force at its timestamp. Columns: tier,
    * n_purchases, n_users, revenue_cents. */
  def revenueByTier(events: DataFrame,
      thresholds: Seq[Long] = TierThresholds): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
    val build = tierHistory(events, thresholds)
      .select(col("user_id"), col("valid_from_us").as("ts_us"), col("tier"))
    AsOfJoin.leftAsOf(purchases, build, Seq("user_id"), "ts_us", Seq("tier"))
      .groupBy(col("asof_tier").as("tier"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * lit(100.0)).cast("long")).as("revenue_cents"))
      .orderBy(col("tier").asc)
  }
}
