package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W5: page single-jump conversion funnel.
  *
  * Reference: PageOneStepConvertRateSpark.java:141-218 — per session,
  * sort actions by time, form adjacent `a_b` slices, keep slices on
  * the target flow, rate(split_i) = count(split_i) / count(prev step)
  * with the first rate against the flow-head PV. The reference NPEs on
  * a zero-PV slice (:275); we emit rate 0 (SURVEY.md §7.3).
  *
  * Spark-first: one lag window per session (same user_id partitioning
  * the sessionizer already created), conditional counts, then the
  * chained division over the K-row splits frame via a second window —
  * no driver-side loop, no broadcast of counts.
  *
  * Rates are integer basis points (floor(10000*a/b)) for cross-engine
  * exactness.
  */
object PageFunnel {

  /** @param sessionized Sessionize.assignSessions output
    * @param flow ordered step sequence, e.g. signup,view,click,purchase */
  def apply(spark: SparkSession, sessionized: DataFrame, flow: Seq[String]): DataFrame = {
    require(flow.size >= 2, "funnel needs at least 2 steps")
    val splits = flow.sliding(2).map(p => s"${p(0)}_${p(1)}").toVector

    // ONE pass over the event frame: each row contributes to its
    // adjacent-pair split and/or (as a flow-head event) the start-PV
    // sentinel; both counts fall out of a single exploded aggregation,
    // so the windowed frame is never evaluated twice.
    val StartKey = "__start__"
    val bySession = Window.partitionBy(col("session_id")).orderBy(col("ts"), col("event_id"))
    val counts = sessionized
      .withColumn("prev_type", lag(col("event_type"), 1).over(bySession))
      // null-PROPAGATING concat (matches the oracle's `||`): a
      // session-initial row (null prev) must form NO split, not a
      // bare event_type that could collide with a flow pair name
      .withColumn("split", concat(col("prev_type"), lit("_"), col("event_type")))
      .select(explode(array(
        when(col("split").isin(splits: _*), col("split")),
        when(col("event_type") === flow.head, lit(StartKey)))).as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))

    // Universe = the split sequence PLUS a sentinel row for the flow
    // head, so the start PV survives the left join even when NO
    // adjacent pair matched any split (counts would then hold only the
    // __start__ row — or nothing at all, in which case the fill gives
    // PV 0). Single evaluation of the big frame; everything below is
    // K+2 rows.
    import spark.implicits._
    val ordered = (splits.zipWithIndex.map { case (s, i) => (s, i.toLong) } :+
      (StartKey, -1L)).toDF("split", "step_idx")

    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byIdx = Window.orderBy(col("step_idx"))
    ordered
      .join(counts.withColumnRenamed("key", "split"), Seq("split"), "left") // J5
      .na.fill(0L, Seq("cnt"))
      .withColumn("start_pv",
        max(when(col("split") === StartKey, col("cnt"))).over(wAll))
      .filter(col("split") =!= StartKey)
      .withColumn("split_count", col("cnt"))
      .withColumn("prev_count",
        coalesce(lag(col("split_count"), 1).over(byIdx), col("start_pv")))
      .withColumn("convert_rate_bp",
        when(col("prev_count") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("split_count") / col("prev_count")).cast("long")))
      .select(col("step_idx"), col("split"), col("split_count"),
        col("prev_count"), col("convert_rate_bp"))
  }

  /** Ordered (subsequence) funnel — the other funnel semantics: a
    * session "reaches step k" when the first k flow steps occur IN
    * ORDER within it, with any events in between (q07's adjacent-pair
    * splits require consecutive rows). Per step: sessions reached,
    * conversion vs the previous step and vs all sessions, in bp.
    *
    * Depth is a greedy earliest-match fold over the session's
    * time-ordered event types: `aggregate(types, 0, (d, t) ->
    * if t = flow[d] then d+1)`. Greedy-earliest is EXACT for
    * subsequence matching (taking the earliest occurrence of step d
    * never forecloses a later step — the remaining suffix only
    * grows), so the fold equals the oracle's unrolled
    * min-position-after-previous joins.
    *
    * Scale shape: the session event-type array rides the SAME
    * user-grain aggregate every session op uses (bounded by the
    * session gap contract); the fold is a map; depth-grain counts
    * (≤ K+1 rows) and the step table are metadata-sized. One fact
    * shuffle total, reusing the sessionize partitioning. */
  def orderedFunnel(spark: SparkSession, sessionized: DataFrame,
      flow: Seq[String]): DataFrame = {
    require(flow.nonEmpty, "funnel needs at least 1 step")
    val flowArr = sqlArray(flow)
    val depths = sessionEvents(sessionized)
      .withColumn("depth", expr(
        s"""aggregate(evs, 0L, (d, e) ->
           |  CASE WHEN d < ${flow.size} AND e.event_type = element_at($flowArr, CAST(d + 1 AS INT))
           |       THEN d + 1 ELSE d END)""".stripMargin))
    depthReport(spark, depths, flow)
  }

  /** Time-boxed ordered funnel — [[orderedFunnel]] with a per-step
    * conversion window (the product-analytics default: "clicked
    * within 10 minutes of viewing"): a session reaches step k when
    * the first k flow steps occur in order AND each step lands within
    * `windowSeconds` of the previous one.
    *
    * Greedy-earliest is NOT exact once windows bind (matching step 1
    * at its earliest occurrence can strand a later restart that
    * converts: A@0, A@50, B@55 with W=10 converts via the second A),
    * so the fold carries per-depth DP state instead: state[d] = the
    * LATEST completion time of the length-d prefix so far (−1 =
    * unreached). Max-time is dominant — a larger completion time only
    * loosens every future window check — and the array `transform`
    * updates all depths SIMULTANEOUSLY from the pre-event state, so
    * one event cannot chain through two steps, while still serving
    * every partial chain it extends (repeated step types included).
    * Reached depth = count of non-negative entries (prefix property:
    * state[d] ≥ 0 requires state[d−1] ≥ 0 at match time).
    *
    * Same scale shape as [[orderedFunnel]]: one fact shuffle riding
    * the sessionize partitioning; the DP state is K longs per session
    * inside a map-stage fold; the report is metadata-sized. */
  def windowedFunnel(spark: SparkSession, sessionized: DataFrame,
      flow: Seq[String], windowSeconds: Long): DataFrame = {
    require(flow.nonEmpty, "funnel needs at least 1 step")
    val flowArr = sqlArray(flow)
    val wUs = windowSeconds * 1000000L
    val k = flow.size
    val depths = sessionEvents(sessionized)
      .withColumn("state", expr(
        s"""aggregate(evs, array_repeat(-1L, $k), (st, e) ->
           |  transform(st, (v, i) ->
           |    CASE WHEN element_at($flowArr, i + 1) = e.event_type
           |              AND (i = 0 OR (element_at(st, i) >= 0L
           |                             AND e.ts_us - element_at(st, i) <= ${wUs}L))
           |         THEN greatest(v, e.ts_us) ELSE v END))""".stripMargin))
      .withColumn("depth", expr("size(filter(state, v -> v >= 0L))").cast("long"))
    depthReport(spark, depths, flow)
  }

  /** [[windowedFunnel]] split by A/B arm — the experimentation read
    * of the funnel: the same DP state fold, with every session
    * assigned its [[Experiment.armCol]] arm (the md5 user draw shared
    * with q147/q148 — a funnel split that buckets differently from
    * the SRM check would be comparing different experiments). Output
    * one row per (arm, step): sessions reached, conversion from the
    * previous step, and reach vs the ARM's own session total — the
    * per-arm curves whose gap IS the treatment effect on the funnel.
    *
    * Scale shape: identical to [[windowedFunnel]] (one fact shuffle,
    * map-stage DP) — the rollup runs at (arm × depth) grain (≤
    * 2·(K+1) rows) and the report join at (arm × step) grain. */
  def windowedFunnelByArm(spark: SparkSession, sessionized: DataFrame,
      flow: Seq[String], windowSeconds: Long,
      splitPct: Int = 50): DataFrame = {
    require(flow.nonEmpty, "funnel needs at least 1 step")
    val flowArr = sqlArray(flow)
    val wUs = windowSeconds * 1000000L
    val k = flow.size
    import spark.implicits._
    val depths = sessionEvents(sessionized)
      .withColumn("state", expr(
        s"""aggregate(evs, array_repeat(-1L, $k), (st, e) ->
           |  transform(st, (v, i) ->
           |    CASE WHEN element_at($flowArr, i + 1) = e.event_type
           |              AND (i = 0 OR (element_at(st, i) >= 0L
           |                             AND e.ts_us - element_at(st, i) <= ${wUs}L))
           |         THEN greatest(v, e.ts_us) ELSE v END))""".stripMargin))
      .withColumn("depth", expr("size(filter(state, v -> v >= 0L))").cast("long"))
      .withColumn("arm", Experiment.armCol("user_id", splitPct))
    val steps = flow.zipWithIndex
      .map { case (s, i) => (i.toLong + 1L, s) }.toDF("step_idx", "step")
    val byDepth = depths.groupBy(col("arm"), col("depth"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = byDepth.groupBy(col("arm"))
      .agg(sum(col("n")).as("total_sessions"))
    val reached = totals
      .crossJoin(broadcast(steps))
      .join(byDepth.select(col("arm").as("__a"), col("depth"), col("n")),
        col("__a") === col("arm") && col("depth") >= col("step_idx"), "left")
      .groupBy(col("arm"), col("total_sessions"), col("step_idx"), col("step"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("sessions_reached"))
    val byArm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("arm")).orderBy(col("step_idx"))
    reached
      .withColumn("prev_reached",
        coalesce(lag(col("sessions_reached"), 1).over(byArm),
          col("total_sessions")))
      .withColumn("conv_from_prev_bp",
        when(col("prev_reached") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("sessions_reached")
            / col("prev_reached")).cast("long")))
      .withColumn("reach_bp",
        when(col("total_sessions") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("sessions_reached")
            / col("total_sessions")).cast("long")))
      .select("arm", "step_idx", "step", "sessions_reached", "prev_reached",
        "conv_from_prev_bp", "reach_bp", "total_sessions")
  }

  private def sqlArray(flow: Seq[String]): String =
    s"array(${flow.map(s => s"'${s.replace("'", "''")}'").mkString(", ")})"

  /** One session row with the time-ordered (ts_us, event_id, type)
    * event structs — the shared fact pass of both funnel variants
    * (rides the sessionize user_id partitioning). */
  private def sessionEvents(sessionized: DataFrame): DataFrame =
    sessionized
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id"),
        col("event_type")))).as("evs"))

  /** Depth-grain rollup → per-step reach/conversion report (shared
    * tail of both funnel variants). */
  private def depthReport(spark: SparkSession, depths: DataFrame,
      flow: Seq[String]): DataFrame = {
    import spark.implicits._
    val steps = flow.zipWithIndex
      .map { case (s, i) => (i.toLong + 1L, s) }.toDF("step_idx", "step")
    // ≤K+1 rows but derived from the full session pass; persisted so
    // the total + per-step consumers don't re-run the fact scan
    val byDepth = depths.groupBy(col("depth")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sessions reaching ≥ step_idx: suffix-sum over the ≤K+1-row
    // depth table (broadcast-class; the window is metadata-grain)
    val total = byDepth.agg(coalesce(sum(col("n")), lit(0L)).as("total_sessions"))
    val reached = steps
      .join(byDepth, col("depth") >= col("step_idx"), "left")
      .groupBy(col("step_idx"), col("step"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("sessions_reached"))
      .crossJoin(broadcast(total))
    val byIdx = Window.orderBy(col("step_idx"))
    reached
      .withColumn("prev_reached",
        coalesce(lag(col("sessions_reached"), 1).over(byIdx),
          col("total_sessions")))
      .withColumn("conv_from_prev_bp",
        when(col("prev_reached") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("sessions_reached")
            / col("prev_reached")).cast("long")))
      .withColumn("conv_from_start_bp",
        when(col("total_sessions") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("sessions_reached")
            / col("total_sessions")).cast("long")))
      .select("step_idx", "step", "sessions_reached", "prev_reached",
        "conv_from_prev_bp", "conv_from_start_bp")
  }

  /** Reference output-edge shape: ONE row, `split=rate|split=rate|...`
    * in flow order (domain/PageSplitConvertRate.java:5-6) — the K-row
    * funnel frame packed with the F8 codec. */
  def packed(spark: SparkSession, sessionized: DataFrame, flow: Seq[String]): DataFrame =
    apply(spark, sessionized, flow)
      .select(struct(col("step_idx"),
        concat_ws("=", col("split"), col("convert_rate_bp")).as("kv")).as("s"))
      .agg(concat_ws("|",
        transform(array_sort(collect_list(col("s"))), x => x.getField("kv")))
        .as("convert_rate"))
}
