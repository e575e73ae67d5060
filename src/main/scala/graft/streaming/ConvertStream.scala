package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion-latency monitor — the live twin of the q154
  * batch funnel edge ([[graft.ops.Integrity.conversionDelays]]): one
  * row per user at the moment of their FIRST `toType` event at-or-
  * after their first `fromType` event, carrying the delay — the feed
  * a retargeting deadline or an attribution-window dashboard reads
  * live instead of from tomorrow's batch.
  *
  * State is two fields per user — (first fromType µs, converted) —
  * the TransitionStream minimal-record shape. The explicit
  * `windowSeconds` is the honest streaming bound: a conversion is
  * only watched for that long after the first fromType, and the
  * event-time timeout reclaims state once the watermark passes
  * first + window (the batch op is unwindowed; the spec pins exact
  * parity whenever every conversion lands inside the window). A
  * toType with no prior fromType builds no state — same semantic as
  * the batch window formulation (an early purchase neither counts
  * nor hides a later one). Converted users keep a tombstone until
  * timeout so a replayed/late toType cannot emit twice.
  *
  * Ordering contract (TransitionStream's caveat, same words): exact
  * as long as each user's events arrive in event-time order ACROSS
  * micro-batches (within a batch the group iterator is sorted); a
  * cross-batch straggler fromType older than consumed state is
  * skipped, never re-anchored.
  */
object ConvertStream {

  /** One emitted conversion. */
  final case class Conversion(user_id: Long, t_from_us: Long,
      delay_s: Long)

  /** (first fromType µs if seen, already emitted). */
  final case class FunnelState(fromUs: Long, converted: Boolean)

  /** The state-transition function (exposed for direct unit tests). */
  def updateUser(fromType: String, toType: String, windowSeconds: Long)(
      userId: Long, events: Iterator[SessionStream.Ev],
      state: GroupState[FunnelState]): Iterator[Conversion] = {
    if (state.hasTimedOut) {
      state.remove() // window closed (or tombstone expired) — reclaim
      return Iterator.empty
    }
    // full µs precision (getTime alone is ms — the batch twin compares
    // unix_micros, and a truncated anchor shifts delay_s / the window
    // edge on sub-ms data): seconds from getTime + µs from getNanos
    def micros(e: SessionStream.Ev): Long =
      math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    // within a timestamp, fromType anchors BEFORE toType consumes —
    // the batch semantic (t_from = min fromType ts; any toType with
    // ts >= t_from counts; event ids are never consulted). Equal-ts
    // pairs split across micro-batches fall under the straggler
    // caveat.
    val sorted = events.toSeq.sortBy(e =>
      (micros(e), if (e.event_type == fromType) 0 else 1, e.event_id))
    var st = state.getOption
    val out = Seq.newBuilder[Conversion]
    sorted.foreach { e =>
      val us = micros(e)
      st match {
        case None if e.event_type == fromType =>
          st = Some(FunnelState(us, converted = false))
        case Some(s) if !s.converted && e.event_type == toType &&
            us >= s.fromUs &&
            us <= s.fromUs + windowSeconds * 1000000L =>
          out += Conversion(userId, s.fromUs, (us - s.fromUs) / 1000000L)
          st = Some(s.copy(converted = true)) // tombstone: emit once
        case _ => () // pre-funnel toType, repeat fromType, straggler
      }
    }
    st match {
      case Some(s) =>
        state.update(s)
        // the natural timeout (first + window) never advances with new
        // events, so once the watermark passes it, any further event
        // for this user (replayed purchase, repeat click) would make
        // setTimeoutTimestamp throw and KILL the query — clamp to just
        // past the current watermark; the next trigger reaps the state
        state.setTimeoutTimestamp(math.max(
          s.fromUs / 1000L + windowSeconds * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      case None => ()
    }
    out.result().iterator
  }

  /** Wire onto a streaming events frame (user_id, event_id, ts,
    * event_type). Output: append-mode conversion stream. */
  def conversions(events: DataFrame, fromType: String = "click",
      toType: String = "purchase", windowSeconds: Long = 7 * 86400L,
      watermark: String = "10 minutes"): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // the batch twin drops NULL ts the same way; unguarded, one
      // NULL-timestamp row would NPE inside updateUser and kill the
      // query (SrmStream guards identically)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lit(null).cast("double").as("value"))
      .as[SessionStream.Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(fromType, toType, windowSeconds))
  }
}
