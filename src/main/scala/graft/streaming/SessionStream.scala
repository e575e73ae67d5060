package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap sessionization — the Structured Streaming twin of
  * the batch `graft.ops.Sessionize` (A1), built on
  * `flatMapGroupsWithState` with event-time timeout.
  *
  * The reference carries pre-assigned session ids in its data and
  * sessionizes only in batch; a real engine must also close sessions
  * on a live stream. Semantics match the batch operator: a session
  * ends when a user is silent for `gapSeconds`; `session_id` is
  * `user_seq` with seq increasing per user in event-time order.
  *
  * Scale shape: state is per-user and O(1) (one open session — no
  * event buffering); the shuffle is the groupByKey on user_id that any
  * stateful per-user computation needs. Watermark bounds state: a
  * user's open session closes (emits) via timeout once the watermark
  * passes last_ts + gap, so state never grows with stragglers.
  */
object SessionStream {

  /** One input event (the events-table wire shape). `value` is the
    * monetary column; None when the source row carries NULL. */
  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Option[Double] = None)

  /** Per-event cents with the batch operator's exact convention
    * (house money rule, Sessionize.sessionAggregates): one IEEE
    * multiply then floor — `floor(value * 100)` — so streamed totals
    * are bit-identical to the batch sums in any engine. (BigDecimal
    * constructions were rejected: `BigDecimal(d)` rounds the exact
    * binary expansion while Spark's double→decimal cast rounds the
    * shortest string repr — for a value printed "2.675" they differ
    * by one cent. floor of the product has no such ambiguity.) */
  private def cents(v: Option[Double]): Long = v.fold(0L)(d =>
    math.floor(d * 100.0).toLong)

  /** Per-user open-session state: O(1), no event buffering — the
    * event-type set is bounded by the event-type vocabulary (a
    * handful), and the value total is one long in cents. After a
    * timeout closes a session the state becomes a TOMBSTONE
    * (startUs == -1) that only remembers `seq`, so the user's next
    * session numbers seq+1 instead of restarting at 1 (which would
    * mint duplicate session_ids). Tombstones are one tiny record per
    * user — the same O(users) footprint the reference keeps in MySQL. */
  final case class OpenSession(seq: Long, startUs: Long, lastUs: Long, steps: Long,
      types: Set[String] = Set.empty, valueCents: Long = 0L) {
    def isTombstone: Boolean = startUs < 0
  }

  /** One closed session (the FULL A1 aggregate grain — the same
    * columns the batch `Sessionize.sessionAggregates` emits:
    * event_types is the sorted distinct concat, total_value_cents the
    * decimal-exact money sum in cents). */
  final case class ClosedSession(user_id: Long, session_id: String,
      start_us: Long, end_us: Long, step_length: Long, visit_length_s: Long,
      event_types: String = "", total_value_cents: Long = 0L)

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, s"${userId}_${s.seq}", s.startUs, s.lastUs, s.steps,
      (s.lastUs - s.startUs) / 1000000L,
      s.types.toSeq.sorted.mkString(","), s.valueCents)

  /** The state-transition function (exposed for direct unit testing). */
  def updateUser(gapSeconds: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val gapUs = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      val out = state.getOption.filterNot(_.isTombstone)
        .map(close(userId, _)).iterator
      // keep the seq as a tombstone (no timeout set → it just persists)
      state.getOption.foreach(s => state.update(OpenSession(s.seq, -1L, -1L, 0L)))
      return out
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      open match {
        case Some(s) if s.isTombstone =>
          open = Some(OpenSession(s.seq + 1, us, us, 1L,
            Set(e.event_type), cents(e.value)))
        case Some(s) if us < s.startUs - gapUs =>
          // cross-batch straggler predating the open session by more
          // than the gap: in event-time order it forms its own earlier
          // session. The open session is not yet emitted, so renumber
          // it after the straggler — ids stay event-time-ordered.
          closed += close(userId,
            OpenSession(s.seq, us, us, 1L, Set(e.event_type), cents(e.value)))
          open = Some(s.copy(seq = s.seq + 1))
        case Some(s) if us - s.lastUs <= gapUs =>
          // merge against the whole [startUs, lastUs] span: a late
          // event inside (or gap-close to) the session extends BOTH
          // ends, so visit_length_s counts it like the batch twin does
          open = Some(s.copy(startUs = math.min(s.startUs, us),
            lastUs = math.max(s.lastUs, us), steps = s.steps + 1,
            types = s.types + e.event_type,
            valueCents = s.valueCents + cents(e.value)))
        case Some(s) =>
          closed += close(userId, s)
          open = Some(OpenSession(s.seq + 1, us, us, 1L,
            Set(e.event_type), cents(e.value)))
        case None =>
          open = Some(OpenSession(1L, us, us, 1L,
            Set(e.event_type), cents(e.value)))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close via timeout when the watermark passes last event + gap
      if (!s.isTombstone)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapSeconds * 1000L)
    }
    closed.result().iterator
  }

  /** Built-in alternative: Spark's native `session_window` gap
    * aggregation. Same gap semantics, less control (no per-user seq
    * numbering — the window start stands in as the session key), but
    * zero custom state code and full SS state-store integration; the
    * right default when the session id's exact shape doesn't matter. */
  def closedSessionWindows(events: DataFrame, gapSeconds: Long = 1800L,
      watermark: String = "10 minutes"): DataFrame = {
    val value =
      if (events.columns.contains("value")) col("value").cast("double")
      else lit(null).cast("double")
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("step_length"),
        concat_ws(",", array_sort(collect_set(col("event_type")))).as("event_types"),
        // house money convention: per-event floor(x*100) cents summed
        // as BIGINT (matches Sessionize + the stateful twin's cents())
        coalesce(sum(floor(value * lit(100.0))), lit(0L)).as("total_value_cents"))
      .select(col("user_id"),
        col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("step_length"), col("event_types"), col("total_value_cents"))
  }

  /** Wire the sessionizer onto a streaming events frame (must carry
    * user_id, event_id, ts, event_type). Output: closed sessions,
    * append mode. */
  def closedSessions(events: DataFrame, gapSeconds: Long = 1800L,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (if (events.columns.contains("value")) col("value").cast("double")
         else lit(null).cast("double")).as("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapSeconds))
  }
}
