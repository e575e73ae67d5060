package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.BacklogStream

/** Streaming backlog monitor: batch parity with the q244 panel, the
  * retract-and-apply IVM step under a late close-moving line, replay
  * idempotence. */
class BacklogStreamSpec extends SparkSpec {

  private def ship(order: Long, open: String, price: Double, shipD: String) =
    BacklogStream.Ship(order, Timestamp.valueOf(s"$open 00:00:00"),
      price, Timestamp.valueOf(s"$shipD 00:00:00"))

  /** Batch recompute over everything fed so far. */
  private def batchEod(events: Seq[BacklogStream.Ship]): Map[String, (Long, Long)] = {
    val s = spark
    import s.implicits._
    val orders = events.map(e => (e.order_id, e.open_ts, e.total_price))
      .distinct.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val li = events.map(e => (e.order_id, e.ship_ts))
      .toDF("l_orderkey", "l_shipdate")
    graft.ops.Retention.orderBacklog(li, orders).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("open_eod"), r.getAs[Long]("open_cents_eod"))))
      .toMap
  }

  private def storeEod(store: InMemoryStore): Map[String, (Long, Long)] =
    store.scan("bl_open_eod").map { case (k, v) =>
      k.head -> ((v, store.get("bl_open_cents_eod", k).get))
    }.toMap

  test("streamed backlog equals the batch panel; a LATE line moves the close and reshapes the walk") {
    val s = spark
    import s.implicits._
    val name = "backlog-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[BacklogStream.Ship]
    val q = BacklogStream.backlogQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-backlog").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[BacklogStream.Ship]
    def feed(es: BacklogStream.Ship*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      // batch 1: order 1 opens 01-01, ships 01-02; order 2 opens and
      // ships 01-01 (same-day close nets 0 at EOD)
      feed(ship(1, "2024-01-01", 10.0, "2024-01-02"),
        ship(2, "2024-01-01", 5.0, "2024-01-01"))
      val st = new InMemoryStore(name)
      val b1 = batchEod(fed.toSeq)
      b1.foreach { case (d, v) =>
        assert(storeEod(st).get(d).contains(v), s"day $d: ${storeEod(st)} vs $b1")
      }
      // batch 2: a LATE line for order 1 ships 01-05 — the close must
      // move 01-02 → 01-05 (retract + apply), reshaping days 2-4
      feed(ship(1, "2024-01-01", 10.0, "2024-01-05"))
      val b2 = batchEod(fed.toSeq)
      b2.foreach { case (d, v) =>
        assert(storeEod(st).get(d).contains(v), s"day $d: ${storeEod(st)} vs $b2")
      }
      assert(st.get("bl_close", Seq("1")).contains(
        java.time.LocalDate.parse("2024-01-05").toEpochDay))
      // an in-span straggler (ships 01-03 < known close) changes nothing
      val before = storeEod(st)
      feed(ship(1, "2024-01-01", 10.0, "2024-01-03"))
      assert(storeEod(st) == before)
    } finally q.stop()
  }

  test("replaying an applied batch is a no-op (ledger inside the maintenance tx)") {
    val s = spark
    import s.implicits._
    val name = "backlog-replay"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[BacklogStream.Ship]
    val q = BacklogStream.backlogQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-backlog").toString)
    try {
      mem.addData(ship(1, "2024-01-01", 10.0, "2024-01-02"))
      q.processAllAvailable()
    } finally q.stop()
    val st = new InMemoryStore(name)
    val before = (storeEod(st), st.scan("bl_day_orders").toSet)
    // re-deliver batch 0 by hand: order-grain summary shape
    val replay = Seq((1L, 19723L, 1000L, 19724L))
      .toDF("order_id", "open_day", "cents", "ship_day")
    BacklogStream.backlogBatch(InMemoryProvider(name))(replay, 0L)
    assert((storeEod(st), st.scan("bl_day_orders").toSet) == before)
  }
}
