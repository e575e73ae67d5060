package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.TrailingStream

/** Streaming trailing-revenue monitor: batch parity with the q257
  * RANGE-frame panel — including a calendar-gap case where value
  * distance must age old days out — cross-batch day updates, replay
  * idempotence. */
class TrailingStreamSpec extends SparkSpec {

  private def order(id: Long, day: String, price: Double) =
    TrailingStream.Order(id, Timestamp.valueOf(s"$day 12:00:00"), price)

  /** Batch recompute over everything fed so far. */
  private def batchPanel(events: Seq[TrailingStream.Order])
      : Map[String, (Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val orders = events.map(e => (e.order_id, e.order_ts, e.total_price))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    graft.ops.Retention.trailingRevenue(orders, 7).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("cents"), r.getAs[Long]("n_orders"),
          r.getAs[Long]("trail_cents"), r.getAs[Long]("trail_orders"))))
      .toMap
  }

  private def storePanel(st: InMemoryStore): Map[String, (Long, Long, Long, Long)] =
    st.scan("tr_day_cents").map { case (k, v) =>
      k.head -> ((v, st.get("tr_day_orders", k).get,
        st.get("tr_trail_cents", k).get, st.get("tr_trail_orders", k).get))
    }.toMap

  test("streamed trailing revenue equals the q257 RANGE panel; calendar gaps age revenue out") {
    val s = spark
    import s.implicits._
    val name = "trailing-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[TrailingStream.Order]
    val q = TrailingStream.trailQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-trailing").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[TrailingStream.Order]
    def feed(es: TrailingStream.Order*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      // batch 1: two adjacent days
      feed(order(1, "2024-01-01", 10.0), order(2, "2024-01-02", 5.0))
      val st = new InMemoryStore(name)
      assert(storePanel(st) == batchPanel(fed.toSeq))
      // batch 2: a SECOND order on an already-published day — inside
      // the watermark, so the SS aggregate emits the new absolute
      // total — plus a later in-window day whose trail spans back
      feed(order(3, "2024-01-02", 2.5), order(5, "2024-01-06", 1.0))
      val panel = storePanel(st)
      assert(panel == batchPanel(fed.toSeq))
      assert(panel("2024-01-02") == ((750L, 2L, 1750L, 3L)))
      assert(panel("2024-01-06") == ((100L, 1L, 1850L, 4L)))
      // batch 3: a day past a calendar gap — 01-20 is > 7 days from
      // every earlier day, so its trailing window must contain ONLY
      // itself (ROWS would leak the old days in; RANGE must not)
      feed(order(4, "2024-01-20", 100.0))
      val p3 = storePanel(st)
      assert(p3 == batchPanel(fed.toSeq))
      assert(p3("2024-01-20") == ((10000L, 1L, 10000L, 1L)),
        "calendar gap leaked old revenue into the trailing window")
    } finally q.stop()
  }

  test("replaying an applied batch is a no-op (absolute puts + derived rebuild are idempotent)") {
    val s = spark
    import s.implicits._
    val name = "trailing-replay"
    InMemoryStore.clear(name)
    val batch = Seq(("2024-03-01", 1000L, 2L), ("2024-03-05", 500L, 1L))
      .toDF("day", "cents", "n_orders")
    TrailingStream.trailBatch(InMemoryProvider(name), 7)(batch, 0L)
    val st = new InMemoryStore(name)
    val before = storePanel(st)
    TrailingStream.trailBatch(InMemoryProvider(name), 7)(batch, 0L)
    assert(storePanel(st) == before)
    assert(before("2024-03-05") == ((500L, 1L, 1500L, 3L)))
  }
}
