package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** Streaming session-path emitter — the live twin of q127's journey
  * report (`graft.ops.Sessionize.sessionPaths`): one row per session
  * carrying its first-`maxSteps` event-type path and whether it
  * converted.
  *
  * Emission timing exploits a property the other close-deferral
  * twins don't have: the PATH PREFIX is final the moment the K-th
  * event arrives (later events can't change the first K), but the
  * CONVERTED flag judges the whole session — so the row still waits
  * for session close (gap exceeded in-stream, or event-time
  * timeout). The prefix-finality shows up as bounded state instead:
  * once K types are buffered the state stops growing no matter how
  * long the session runs (≤K strings + three longs per user — the
  * whole point of prefix truncation, live or batch).
  *
  * Ordering contract: TransitionStream's — per-user event-time order
  * across micro-batches; in-batch sorted here; stragglers behind
  * consumed state are skipped.
  */
object PathStream {

  /** One emitted session journey. */
  final case class Journey(user_id: Long, session_start_us: Long,
      path: String, n_events: Long, converted: Int)

  /** Open-session state: start, last event time, ≤maxSteps prefix
    * types, total event count, conversion seen. */
  final case class Open(startUs: Long, lastUs: Long, prefix: Seq[String],
      nEvents: Long, converted: Boolean)

  def updateUser(gapSeconds: Long, maxSteps: Int, convType: String)(
      userId: Long, events: Iterator[SessionStream.Ev],
      state: GroupState[Open]): Iterator[Journey] = {
    val gapUs = gapSeconds * 1000000L
    def emit(o: Open): Journey =
      Journey(userId, o.startUs, o.prefix.mkString(">"), o.nEvents,
        if (o.converted) 1 else 0)
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit)
      state.remove()
      return out.iterator
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var open = state.getOption
    val out = Seq.newBuilder[Journey]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      open match {
        case Some(o) if us < o.lastUs =>
          () // straggler behind consumed state: skip
        case Some(o) if us - o.lastUs <= gapUs => // session continues
          open = Some(Open(o.startUs, us,
            if (o.prefix.length < maxSteps) o.prefix :+ e.event_type
            else o.prefix,
            o.nEvents + 1, o.converted || e.event_type == convType))
        case Some(o) => // gap exceeded: close the old, open a new
          out += emit(o)
          open = Some(Open(us, us, Seq(e.event_type), 1L,
            e.event_type == convType))
        case None =>
          open = Some(Open(us, us, Seq(e.event_type), 1L,
            e.event_type == convType))
      }
    }
    open.foreach { o =>
      state.update(o)
      state.setTimeoutTimestamp(o.lastUs / 1000L + gapSeconds * 1000L)
    }
    out.result().iterator
  }

  /** Wire onto a streaming events frame. Append-mode journey stream;
    * fold to the q127 report with [[report]]. */
  def journeys(events: DataFrame, gapSeconds: Long = 1800L,
      maxSteps: Int = 5, convType: String = "purchase",
      watermark: String = "10 minutes"): Dataset[Journey] = {
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
        updateUser(gapSeconds, maxSteps, convType))
  }

  /** Batch rollup of a journey set to q127's report columns. */
  def report(journeys: DataFrame, k: Int = 20): DataFrame =
    journeys
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted").cast("long")).as("n_converted"))
      .withColumn("conv_bp",
        floor(lit(10000.0) * col("n_converted") / col("n_sessions"))
          .cast("long"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
}
