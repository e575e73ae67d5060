package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Market
import graft.streaming.CoVisitStream
import graft.streaming.CoVisitStream.{Basket, ItemEv, Pair}

/** Streaming co-visitation: exact pair_sessions parity with the q90
  * batch operator once sessions close, cap-eviction exactness,
  * session isolation. */
class CoVisitStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  /** events-table wire shape for MemoryStream. */
  final case class RawEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  private def ev(id: Long, user: Long, offsetS: Long, item: Long) =
    RawEv(id, new Timestamp(T0 + offsetS * 1000L), user, "click", 1.0,
      s"""{"k":"$item"}""")

  private def plain(id: Long, user: Long, offsetS: Long) =
    RawEv(id, new Timestamp(T0 + offsetS * 1000L), user, "view", 1.0, "{}")

  private def runPairs(batches: Seq[Seq[RawEv]], cap: Int = 64): Seq[Pair] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[RawEv]
    val out = CoVisitStream.pairs(mem.toDF(), cap = cap)
    val name = s"covisit_out_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-covisit").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // two far-future flush batches: the first advances the
      // watermark past every session's last + gap, the second gives
      // the timeout a batch to fire in
      mem.addData(plain(900001L, 999999L, 100000L)); q.processAllAvailable()
      mem.addData(plain(900002L, 999999L, 100001L)); q.processAllAvailable()
      spark.table(name).as[Pair].collect().toSeq
    } finally q.stop()
  }

  private def batchDf(evs: Seq[RawEv]) = {
    val s = spark
    import s.implicits._
    evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("pair counts across batch splits equal the q90 batch operator") {
    val evs = Seq(
      // user 1, one session: items 5, 3, 9 (+ an item-less event that
      // only advances the clock)
      ev(0, 1, 0, 5), ev(1, 1, 60, 3), plain(2, 1, 90), ev(3, 1, 120, 9),
      // user 2: items 5, 3 — same pair as user 1's second session
      ev(6, 2, 0, 5), ev(7, 2, 30, 3),
      // user 3: single item → no pairs
      ev(8, 3, 0, 7),
      // user 1, second session (gap > 1800 s): items 3, 5 again
      ev(4, 1, 4000, 3), ev(5, 1, 4060, 5))
    // batch splits respect global event-time order (the watermark is
    // query-global): mid-session split for user 1, the 4000 s events
    // arrive only after every 0-120 s event is in
    val got = runPairs(Seq(evs.take(3), evs.slice(3, 7), evs.drop(7)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = Market.coVisitPairs(batchDf(evs))
      .collect()
      .map(r => Pair(r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        r.getAs[Long]("pair_sessions")).toMap
    assert(got == want)
    assert(want(Pair(3L, 5L)) == 3L) // sanity: the pair seen in 3 sessions
  }

  test("cap keeps the smallest ids exactly like the batch rule, even out of arrival order") {
    // cap=2: arrival order 9, 4, 2 — 9 must be evicted by 2's arrival,
    // so the only pair is (2,4), matching batch slice(sort(set),1,2)
    val evs = Seq(ev(0, 1, 0, 9), ev(1, 1, 10, 4), ev(2, 1, 20, 2))
    val got = runPairs(Seq(evs), cap = 2)
    assert(got == Seq(Pair(2L, 4L)))
    val want = Market.coVisitPairs(batchDf(evs), maxItems = 2)
      .select("item_a", "item_b").collect()
      .map(r => Pair(r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("updateBasket unit: gap closes the old basket mid-stream; straggler skipped") {
    val state = new TestGroupState[Basket]
    def ie(id: Long, offsetS: Long, item: Long) =
      ItemEv(7L, id, new Timestamp(T0 + offsetS * 1000L), Some(item))
    // session 1 (items 1,2) closes when the 4000s event arrives
    val out1 = CoVisitStream.updateBasket(1800L, 64)(7L,
      Iterator(ie(0, 0, 1), ie(1, 60, 2), ie(2, 4000, 8)), state).toSeq
    assert(out1 == Seq(Pair(1L, 2L)))
    assert(state.get.items == List(8L))
    // straggler older than consumed state: ignored entirely
    val out2 = CoVisitStream.updateBasket(1800L, 64)(7L,
      Iterator(ie(3, 100, 5)), state).toSeq
    assert(out2.isEmpty && state.get.items == List(8L))
  }
}
