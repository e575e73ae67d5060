package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming session-basket co-visitation — the live twin of the q90
  * batch pair counts (`graft.ops.Market.coVisitPairs`): as sessions
  * CLOSE (gap exceeded in-stream, or event-time timeout once the
  * watermark passes last + gap), emit the session's a<b item pairs.
  * Downstream a pair-count rollup or KeyedStore sink accumulates
  * pair_sessions; CoVisitStreamSpec pins exact parity with the batch
  * operator on an in-order stream.
  *
  * Emitting at session close (not per event) is what makes the CAP
  * exact: the batch rule keeps the `cap` SMALLEST item ids of the
  * whole session, and keeping the cap smallest incrementally in
  * state reproduces that rule only once the session is final — an
  * eager emission could name a pair whose member is later evicted by
  * a smaller id, and append mode cannot retract. Same trade
  * SessionStream makes for its session-grain aggregate.
  *
  * Sessionization parity: ALL events advance the gap clock (the
  * batch op sessionizes the full stream, then extracts items), so
  * item-less events are consumed for their timestamps and add
  * nothing to the basket.
  *
  * State per user: last event-time plus the ≤`cap` smallest distinct
  * item ids of the open session (cap=64 → ~0.5 KB); event-time
  * timeout reclaims it when the session can no longer continue —
  * O(active users) state. Straggler contract as TransitionStream:
  * a cross-batch event older than consumed state is skipped, never
  * regresses state (batch reprocessing owns exact late-data
  * semantics).
  */
object CoVisitStream {

  /** Wire shape after item extraction; `item` None for events whose
    * props carry no item id (they still advance the session clock). */
  final case class ItemEv(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, item: Option[Long])

  /** One emitted co-visitation pair (item_a < item_b), one row per
    * closed session containing both. */
  final case class Pair(item_a: Long, item_b: Long)

  /** (last event-time µs, sorted ≤cap smallest distinct items). */
  final case class Basket(lastUs: Long, items: List[Long])

  /** Keep the `cap` smallest distinct ids — incremental form of the
    * batch rule slice(array_sort(collect_set(item)), 1, cap). */
  private[streaming] def insertCapped(items: List[Long], item: Long,
      cap: Int): List[Long] =
    if (items.contains(item)) items
    else {
      val ins = (item :: items).sorted
      if (ins.length > cap) ins.init else ins
    }

  private def pairsOf(items: List[Long]): Iterator[Pair] = {
    val v = items.toVector // sorted ascending by construction
    (for { i <- v.indices.iterator; j <- (i + 1 until v.length).iterator }
      yield Pair(v(i), v(j)))
  }

  /** The state-transition function (exposed for direct unit tests). */
  def updateBasket(gapSeconds: Long, cap: Int)(
      userId: Long, events: Iterator[ItemEv],
      state: GroupState[Basket]): Iterator[Pair] = {
    val gapUs = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      val items = state.get.items
      state.remove() // watermark passed last + gap: session is final
      return pairsOf(items)
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption
    val out = Seq.newBuilder[Pair]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      def added(items: List[Long]): List[Long] =
        e.item.fold(items)(insertCapped(items, _, cap))
      st match {
        case Some(b) if us < b.lastUs =>
          () // straggler behind consumed state: skip (contract above)
        case Some(b) if us - b.lastUs <= gapUs =>
          st = Some(Basket(us, added(b.items)))
        case Some(b) => // gap exceeded: the old session is final
          out ++= pairsOf(b.items)
          st = Some(Basket(us, added(Nil)))
        case None =>
          st = Some(Basket(us, added(Nil)))
      }
    }
    st.foreach { b =>
      state.update(b)
      state.setTimeoutTimestamp(b.lastUs / 1000L + gapSeconds * 1000L)
    }
    out.result().iterator
  }

  /** Wire onto a streaming events frame (user_id, event_id, ts,
    * props). Output: append-mode pair stream, one row per (closed
    * session, pair). */
  def pairs(events: DataFrame, gapSeconds: Long = 1800L, cap: Int = 64,
      itemCol: String = "$.k", watermark: String = "10 minutes"): Dataset[Pair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"),
        get_json_object(col("props"), itemCol).cast("long").as("item"))
      .as[ItemEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateBasket(gapSeconds, cap))
  }
}
