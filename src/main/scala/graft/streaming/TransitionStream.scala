package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transition monitor — the live twin of the
  * q91 batch matrix (`graft.ops.Market.transitions`): emits one
  * (prev → next) step per within-session consecutive event pair, as
  * they happen. Downstream, the step stream feeds the same
  * count/probability rollup the batch op runs (TransitionStreamSpec
  * pins exact count parity on an in-order stream).
  *
  * State is the MINIMAL per-user record — (last event-time, last
  * type), two fields, no buffering — against SessionStream's
  * fuller open-session aggregate: a transition needs only the
  * immediately preceding event. Event-time timeout removes state
  * once the watermark passes last + gap (the session could never
  * continue, so the memory is reclaimable — O(active users) state).
  *
  * Ordering contract (the honest streaming caveat): steps are
  * emitted in per-user event-time order as long as each user's
  * events arrive in order ACROSS micro-batches (within a batch the
  * group iterator is sorted here). A cross-batch straggler older
  * than the user's last seen event cannot retract the step its
  * neighbors already formed — it is skipped, never paired, and
  * never regresses state (batch reprocessing owns exact late-data
  * semantics; q91 is the same rollup batch-side).
  */
object TransitionStream {

  /** One emitted transition step. */
  final case class Step(user_id: Long, prev_type: String, next_type: String,
      ts_us: Long)

  /** (last event-time µs, last event type) — the whole per-user state. */
  final case class LastEv(lastUs: Long, lastType: String)

  /** The state-transition function (exposed for direct unit testing). */
  def updateUser(gapSeconds: Long)(
      userId: Long, events: Iterator[SessionStream.Ev],
      state: GroupState[LastEv]): Iterator[Step] = {
    val gapUs = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      state.remove() // session can no longer continue — reclaim
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[Step]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      last match {
        case Some(l) if us < l.lastUs =>
          () // straggler behind consumed state: skip (contract above)
        case Some(l) if us - l.lastUs <= gapUs =>
          out += Step(userId, l.lastType, e.event_type, us)
          last = Some(LastEv(us, e.event_type))
        case _ => // first event, or gap exceeded: new session, no step
          last = Some(LastEv(us, e.event_type))
      }
    }
    last.foreach { l =>
      state.update(l)
      state.setTimeoutTimestamp(l.lastUs / 1000L + gapSeconds * 1000L)
    }
    out.result().iterator
  }

  /** Wire onto a streaming events frame (user_id, event_id, ts,
    * event_type). Output: append-mode step stream. */
  def steps(events: DataFrame, gapSeconds: Long = 1800L,
      watermark: String = "10 minutes"): Dataset[Step] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lit(null).cast("double").as("value"))
      .as[SessionStream.Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapSeconds))
  }
}
