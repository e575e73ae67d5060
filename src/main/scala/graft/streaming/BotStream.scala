package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bot/automation detection — the live twin of the q112
  * batch verdicts (`graft.ops.Sessionize.botSessions`): as sessions
  * close (gap exceeded in-stream, or event-time timeout once the
  * watermark passes last + gap), emit the session's gap-statistics
  * verdict. The ingestion-time half of the hygiene gate: a T4-style
  * blacklist sink can consume `is_bot` rows to quarantine users while
  * the batch op owns exact late-data semantics.
  *
  * Emitting at close (not per event) is what makes the verdict exact:
  * `flag_fast` compares the MEAN gap of the whole session and
  * `flag_metronome` its full spread — both are prefix-unstable, and
  * append mode cannot retract an early verdict (the SessionStream /
  * CoVisitStream trade).
  *
  * State per user: six longs (first/last event-time, count, min/max/
  * sum gap) — O(active users), no buffering of events. Straggler
  * contract as TransitionStream: an event older than consumed state
  * is skipped, never regresses state. Sessions are identified by
  * (user_id, start_us) rather than the batch `user_seq` ordinal: the
  * ordinal would need unbounded per-user state to survive session
  * timeouts, and (user, start) is the same key — BotStreamSpec joins
  * the two operators on it.
  */
object BotStream {

  /** Wire shape consumed from the events stream. */
  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

  /** Open-session gap statistics (six longs; gaps −1 until the
    * session has ≥ 2 events — Options would double the state size). */
  final case class Open(firstUs: Long, lastUs: Long, n: Long,
      minGap: Long, maxGap: Long, sumGap: Long)

  /** One closed session's verdict — the q112 row at (user, start)
    * grain; gap columns None for single-event sessions, exactly like
    * the batch nulls. */
  final case class Verdict(user_id: Long, start_us: Long, n_events: Long,
      duration_s: Long, min_gap_us: Option[Long], max_gap_us: Option[Long],
      sum_gap_us: Option[Long], avg_gap_us: Option[Long],
      flag_fast: Int, flag_metronome: Int, is_bot: Int)

  private[graft] def verdictOf(o: Open, minEvents: Long,
      fastGapUs: Long, jitterUs: Long): Verdict = {
    val gaps = o.n > 1
    val avg = if (gaps) Some(o.sumGap / (o.n - 1)) else None
    val fast = if (o.n >= minEvents && gaps && avg.get < fastGapUs) 1 else 0
    val metro = if (o.n >= math.max(minEvents, 3L) && gaps &&
      o.maxGap - o.minGap <= jitterUs) 1 else 0
    Verdict(0L, o.firstUs, o.n, (o.lastUs - o.firstUs) / 1000000L,
      if (gaps) Some(o.minGap) else None, if (gaps) Some(o.maxGap) else None,
      if (gaps) Some(o.sumGap) else None, avg,
      fast, metro, if (fast == 1 || metro == 1) 1 else 0)
  }

  private def advanced(o: Open, us: Long): Open = {
    val g = us - o.lastUs
    Open(o.firstUs, us, o.n + 1,
      if (o.n == 1) g else math.min(o.minGap, g),
      if (o.n == 1) g else math.max(o.maxGap, g),
      if (o.n == 1) g else o.sumGap + g)
  }

  /** The state-transition function (exposed for direct unit tests). */
  def updateSession(gapSeconds: Long, minEvents: Long, fastGapUs: Long,
      jitterUs: Long)(userId: Long, events: Iterator[Ev],
      state: GroupState[Open]): Iterator[Verdict] = {
    val gapUs = gapSeconds * 1000000L
    def emit(o: Open) =
      verdictOf(o, minEvents, fastGapUs, jitterUs).copy(user_id = userId)
    if (state.hasTimedOut) {
      val o = state.get
      state.remove()
      return Iterator.single(emit(o))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption
    val out = Seq.newBuilder[Verdict]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      st match {
        case Some(o) if us < o.lastUs =>
          () // straggler behind consumed state: skip (contract above)
        case Some(o) if us - o.lastUs <= gapUs =>
          st = Some(advanced(o, us))
        case Some(o) => // gap exceeded: the old session is final
          out += emit(o)
          st = Some(Open(us, us, 1L, -1L, -1L, -1L))
        case None =>
          st = Some(Open(us, us, 1L, -1L, -1L, -1L))
      }
    }
    st.foreach { o =>
      state.update(o)
      state.setTimeoutTimestamp(o.lastUs / 1000L + gapSeconds * 1000L)
    }
    out.result().iterator
  }

  /** Wire onto a streaming events frame (user_id, event_id, ts, ...).
    * Output: append-mode verdict stream, one row per closed session. */
  def verdicts(events: DataFrame, gapSeconds: Long = 1800L,
      minEvents: Long = 5L, fastGapUs: Long = 2000000L,
      jitterUs: Long = 1000000L,
      watermark: String = "10 minutes"): Dataset[Verdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateSession(gapSeconds, minEvents, fastGapUs, jitterUs))
  }
}
