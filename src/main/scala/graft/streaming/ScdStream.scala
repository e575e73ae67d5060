package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 maintenance — the live twin of the q297 batch
  * build (`graft.ops.Scd.tierHistory`): the user's loyalty-tier
  * version rows are emitted AS the crossing purchase arrives, so the
  * dimension table downstream systems join against is current within
  * a micro-batch instead of a nightly rebuild (the classic warehouse
  * gap: the batch SCD is always a day stale).
  *
  * Every emitted row is FINAL at emission (a tier, derived from a
  * nondecreasing cumulative count, can never be un-crossed), so
  * append mode never retracts — the AttributionStream argument. The
  * open version's `valid_to` is intentionally NOT emitted: closing a
  * version is the CONSUMER's fold ([[history]] — one lead window),
  * exactly how the batch build derives it.
  *
  * State per user is three longs-worth — (cumulative purchases,
  * current tier, last event µs) — the T5 running-totals regime:
  * lifetime per-user counters, O(active users), no buffering, no
  * timeout (a tier is a lifetime property; contrast the session
  * machines whose state dies with the watermark).
  *
  * Ordering contract (TransitionStream's): per-user event-time order
  * is required ACROSS micro-batches (within a batch the group
  * iterator is sorted here); a cross-batch straggler older than the
  * consumed state is skipped — it could only rewrite versions already
  * emitted. Batch q297 owns exact late-data semantics on replay.
  */
object ScdStream {

  /** One emitted version-open row (valid_to is the consumer's fold). */
  final case class Version(user_id: Long, tier: Int, valid_from_us: Long)

  /** (cumulative purchase count, current tier, last event µs). */
  final case class TierState(cum: Long, tier: Int, lastUs: Long)

  private def tierOf(cum: Long, thresholds: Seq[Long]): Int =
    thresholds.count(cum >= _)

  /** The state-transition function (exposed for direct unit testing):
    * the first event ever opens the user's version at its tier; after
    * that a version row is emitted exactly when the tier changes. */
  def updateUser(thresholds: Seq[Long])(
      userId: Long, events: Iterator[SessionStream.Ev],
      state: GroupState[TierState]): Iterator[Version] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var s = state.getOption
    val out = Seq.newBuilder[Version]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      val isP = e.event_type == "purchase"
      s match {
        case Some(st) if us < st.lastUs =>
          () // straggler behind consumed state: skip (contract above)
        case Some(st) =>
          val cum = st.cum + (if (isP) 1L else 0L)
          val t = tierOf(cum, thresholds)
          if (t != st.tier) out += Version(userId, t, us)
          s = Some(TierState(cum, t, us))
        case None =>
          val cum = if (isP) 1L else 0L
          val t = tierOf(cum, thresholds)
          out += Version(userId, t, us)
          s = Some(TierState(cum, t, us))
      }
    }
    s.foreach(state.update)
    out.result().iterator
  }

  /** Wire onto a streaming events frame (user_id, event_id, ts,
    * event_type). Output: append-mode version-open stream. */
  def versions(events: DataFrame,
      thresholds: Seq[Long] = graft.ops.Scd.TierThresholds,
      watermark: String = "10 minutes"): Dataset[Version] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lit(null).cast("double").as("value"))
      .as[SessionStream.Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateUser(thresholds))
  }

  /** Consumer fold of a version set to the q297 history shape —
    * shared by the parity spec and any foreachBatch sink. */
  def history(versions: DataFrame): DataFrame =
    versions
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(Window
          .partitionBy(col("user_id"))
          .orderBy(col("valid_from_us"), col("tier"))) - 1L)
      .select(col("user_id"), col("tier"), col("valid_from_us"),
        col("valid_to_us"))
}
