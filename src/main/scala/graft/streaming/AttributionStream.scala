package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion attribution — the live twin of the q124 batch
  * report (`graft.ops.Sessionize.attribution`): every conversion
  * event emits its first-touch and last-touch credit AS IT HAPPENS.
  * Unlike the bot/savings twins there is nothing to wait for — both
  * models look strictly BACKWARD within the session, so the verdict
  * is final at the conversion event itself and append mode never has
  * to retract (no session-close deferral needed).
  *
  * State per user is four fields — (last event-time µs, the open
  * session's first event type, the previous event's type, events
  * seen this session) — O(active users), no buffering. Event-time
  * timeout reclaims state once the watermark passes last + gap
  * (the session can never continue).
  *
  * Ordering contract (TransitionStream's): per-user event-time order
  * is required ACROSS micro-batches (within a batch the group
  * iterator is sorted here); a cross-batch straggler older than the
  * consumed state is skipped — it can neither change a credit already
  * emitted nor regress state. Batch q124 owns exact late-data
  * semantics on replay.
  */
object AttributionStream {

  /** One emitted conversion credit (both models on one row — they are
    * decided together; the report explode is a downstream concern). */
  final case class Credit(user_id: Long, ts_us: Long,
      first_touch: String, last_touch: String)

  /** (last event µs, the open session's first event type, the last
    * event's type) — the whole per-user state, three fields. */
  final case class Sess(lastUs: Long, firstType: String, lastType: String)

  /** The state-transition function (exposed for direct unit testing). */
  def updateUser(gapSeconds: Long, convType: String)(
      userId: Long, events: Iterator[SessionStream.Ev],
      state: GroupState[Sess]): Iterator[Credit] = {
    val gapUs = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var s = state.getOption
    val out = Seq.newBuilder[Credit]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      s match {
        case Some(st) if us < st.lastUs =>
          () // straggler behind consumed state: skip (contract above)
        case Some(st) if us - st.lastUs <= gapUs => // session continues
          if (e.event_type == convType)
            out += Credit(userId, us, st.firstType, st.lastType)
          s = Some(Sess(us, st.firstType, e.event_type))
        case _ => // first event ever, or gap exceeded: session opens
          if (e.event_type == convType)
            out += Credit(userId, us, "direct", "direct")
          s = Some(Sess(us, e.event_type, e.event_type))
      }
    }
    s.foreach { st =>
      state.update(st)
      state.setTimeoutTimestamp(st.lastUs / 1000L + gapSeconds * 1000L)
    }
    out.result().iterator
  }

  /** Wire onto a streaming events frame (user_id, event_id, ts,
    * event_type). Output: append-mode credit stream; fold it to the
    * q124 report shape with [[report]]. */
  def credits(events: DataFrame, gapSeconds: Long = 1800L,
      convType: String = "purchase",
      watermark: String = "10 minutes"): Dataset[Credit] = {
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
        updateUser(gapSeconds, convType))
  }

  /** Batch-side rollup of a credit set to the q124 report columns —
    * shared by the parity spec and any foreachBatch consumer. */
  def report(credits: DataFrame): DataFrame = {
    val byModel = org.apache.spark.sql.expressions.Window
      .partitionBy(col("model"))
    credits
      .select(explode(array(
        struct(lit("first").as("model"), col("first_touch").as("channel")),
        struct(lit("last").as("model"), col("last_touch").as("channel"))))
        .as("mc"))
      .select(col("mc.model").as("model"), col("mc.channel").as("channel"))
      .groupBy(col("model"), col("channel"))
      .agg(count(lit(1)).as("conversions"))
      .withColumn("share_bp",
        floor(lit(10000.0) * col("conversions") /
          sum(col("conversions")).over(byModel)).cast("long"))
  }
}
