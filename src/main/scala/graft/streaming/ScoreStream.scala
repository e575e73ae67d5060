package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming model-accuracy monitor — the live twin of the q177
  * batch backtest ([[graft.ops.Market.nextItemBacktest]]): every
  * within-session item transition is scored against the deployed
  * majority-transition model THE MOMENT IT HAPPENS, emitting one row
  * per transition with its covered/hit verdict. Downstream, any
  * window of the scored stream is a live accuracy read — the
  * dashboard that catches a model gone stale days before the nightly
  * backtest would (ScoreStreamSpec pins exact total parity with the
  * q177 numbers on a split log).
  *
  * Composition, not new state semantics: the per-user state machine
  * is TransitionStream's minimal record at ITEM grain — (last
  * event-time µs, last item), event-time timeout at gap — and the
  * model is a STATIC broadcast table (`Market.majorityNextItemModel`,
  * item-catalog grain), joined statelessly after the step extraction.
  * Model refresh is a restart with a new table — the honest
  * production shape (a mid-stream model swap would make the
  * accuracy series uninterpretable).
  *
  * Ordering contract (TransitionStream's caveat, same words): steps
  * are exact as long as each user's events arrive in event-time
  * order ACROSS micro-batches; a cross-batch straggler older than
  * consumed state is skipped, never paired, never regresses state.
  */
object ScoreStream {

  /** One item event (the wire shape after item extraction). */
  final case class IEv(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, item: Long)

  /** One emitted within-session item transition. */
  final case class ItemStep(user_id: Long, ts: java.sql.Timestamp,
      prev_item: Long, next_item: Long)

  /** (last event-time µs, last item) — the whole per-user state. */
  final case class LastItem(lastUs: Long, lastItem: Long)

  /** Full-µs precision (getTime is ms; getNanos carries the rest). */
  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** The state-transition function (exposed for direct unit tests). */
  def updateUser(gapSeconds: Long)(
      userId: Long, events: Iterator[IEv],
      state: GroupState[LastItem]): Iterator[ItemStep] = {
    val gapUs = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      state.remove() // session can no longer continue — reclaim
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[ItemStep]
    sorted.foreach { e =>
      val us = micros(e.ts)
      last match {
        case Some(l) if us < l.lastUs =>
          () // straggler behind consumed state: skip (contract above)
        case Some(l) if us - l.lastUs <= gapUs =>
          out += ItemStep(userId, e.ts, l.lastItem, e.item)
          last = Some(LastItem(us, e.item))
        case _ => // first event, or gap exceeded: new session, no step
          last = Some(LastItem(us, e.item))
      }
    }
    last.foreach { l =>
      state.update(l)
      state.setTimeoutTimestamp(l.lastUs / 1000L + gapSeconds * 1000L)
    }
    out.result().iterator
  }

  /** Item transitions off a streaming events frame (user_id,
    * event_id, ts, props). Append mode; O(active users) state. */
  def itemSteps(events: DataFrame, gapSeconds: Long = 1800L,
      watermark: String = "10 minutes",
      itemCol: String = "$.k"): Dataset[ItemStep] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .withColumn("item", get_json_object(col("props"), itemCol).cast("long"))
      .filter(col("item").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("item"))
      .as[IEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapSeconds))
  }

  /** The scored stream: each transition joined (broadcast, stateless)
    * against the static (prev_item, predicted) model. `covered` = the
    * model had an opinion (cold-start rows carry 0); `hit` = the
    * opinion was right. Columns: user_id, ts, prev_item, next_item,
    * predicted (nullable), covered, hit. */
  def scoredSteps(events: DataFrame, model: DataFrame,
      gapSeconds: Long = 1800L, watermark: String = "10 minutes",
      itemCol: String = "$.k"): DataFrame =
    itemSteps(events, gapSeconds, watermark, itemCol)
      .join(broadcast(model), Seq("prev_item"), "left")
      .select(col("user_id"), col("ts"), col("prev_item"),
        col("next_item"), col("predicted"),
        col("predicted").isNotNull.cast("long").as("covered"),
        (col("predicted") === col("next_item"))
          .cast("long").as("hit"))
      .withColumn("hit", coalesce(col("hit"), lit(0L)))

  /** Batch-side rollup of a scored frame to the q177 report shape —
    * what a dashboard runs over any window of the scored stream. */
  def accuracy(scored: DataFrame): DataFrame =
    scored.agg(
      count(lit(1)).as("n_test"),
      coalesce(sum(col("covered")), lit(0L)).as("n_covered"),
      coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("n_test"), col("n_covered"), col("n_hits"),
        when(col("n_test") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("n_hits") / col("n_test"))
            .cast("long")).as("acc_bp"),
        when(col("n_covered") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("n_hits") / col("n_covered"))
            .cast("long")).as("covered_acc_bp"))
}
