package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tolerance-window event dedup — the live twin of the q264
  * batch report (`Dedup.eventBurstDedup`): within each (user, event
  * type), an event arriving ≤ `toleranceSec` after its predecessor is
  * a duplicate burst member (double-click, client retry). The stream
  * emits PER-EVENT verdicts in append mode — the shape an ingestion
  * edge wants, routing keepers and dups to different sinks; the q264
  * type-grain report is a plain rollup of the verdict stream.
  *
  * State per (user, type): ONE long — the latest event's
  * microseconds. The gap chains to the PREVIOUS event whether or not
  * it was itself a dup (the batch rule: a retry storm collapses to
  * its first event). Event-time timeout evicts idle keys once the
  * watermark passes last + tolerance, so state is bounded by the
  * ACTIVE key set, never the event count; after eviction the next
  * event is trivially a keeper — identical to the batch verdict
  * whenever the watermark delay ≥ tolerance (run it that way).
  *
  * Out-of-order arrivals (inside the watermark): an event landing
  * at-or-before the covered span's end scores against the latest
  * seen timestamp — the covered-span rule (BacklogStream's
  * straggler convention): it is a dup if it lands within tolerance
  * of coverage, and the span never moves backward. In-order feeds
  * reproduce the batch verdicts exactly (spec-pinned).
  */
object BurstStream {

  /** One input event (the events-table wire shape). */
  final case class Ev(user_id: Long, event_type: String, event_id: Long,
      ts: java.sql.Timestamp)

  /** Latest covered microsecond for a (user, type) key. */
  final case class LastSeen(lastUs: Long)

  /** One per-event verdict (append output). */
  final case class Verdict(user_id: Long, event_type: String,
      event_id: Long, ts_us: Long, is_dup: Int)

  /** The state-transition function (exposed for direct unit tests). */
  def step(toleranceSec: Long)(key: (Long, String), events: Iterator[Ev],
      state: GroupState[LastSeen]): Iterator[Verdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val tolUs = toleranceSec * 1000000L
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var last: Option[Long] = state.getOption.map(_.lastUs)
    val out = sorted.map { e =>
      val us = e.ts.getTime * 1000L
      val dup = last.exists(l => us - l <= tolUs)
      last = Some(last.fold(us)(math.max(_, us)))
      Verdict(key._1, key._2, e.event_id, us, if (dup) 1 else 0)
    }
    last.foreach { l =>
      state.update(LastSeen(l))
      state.setTimeoutTimestamp(l / 1000L + toleranceSec * 1000L)
    }
    out.iterator
  }

  /** Wire the scrubber onto a streaming events frame (must carry
    * user_id, event_type, event_id, ts). Output: per-event verdicts,
    * append mode. */
  def verdicts(events: DataFrame, toleranceSec: Long = 10L,
      watermark: String = "10 minutes"): Dataset[Verdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(toleranceSec))
  }
}
