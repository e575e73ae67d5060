package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.EwmaStream

/** Streaming EWMA spike monitor: batch parity with the q272 dyadic
  * panel — including the dark-day dilution case — cross-batch day
  * updates, replay idempotence. */
class EwmaStreamSpec extends SparkSpec {

  private val W = 4 // small kernel: weights 8,4,2,1 over mass 15

  private def order(id: Long, day: String, price: Double) =
    EwmaStream.Order(id, Timestamp.valueOf(s"$day 12:00:00"), price)

  /** Batch recompute over everything fed so far. */
  private def batchPanel(events: Seq[EwmaStream.Order])
      : Map[String, (Long, Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    val orders = events.map(e => (e.order_id, e.order_ts, e.total_price))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    graft.ops.Retention.ewmaRevenue(orders, W).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("cents"), r.getAs[Long]("ewma_cents"),
          if (r.isNullAt(r.fieldIndex("spike_bp"))) None
          else Some(r.getAs[Long]("spike_bp")))))
      .toMap
  }

  private def storePanel(st: InMemoryStore)
      : Map[String, (Long, Long, Option[Long])] =
    st.scan("ew_day_cents").map { case (k, v) =>
      k.head -> ((v, st.get("ew_ewma_cents", k).get,
        st.get("ew_spike_bp", k)))
    }.toMap

  test("streamed EWMA equals the q272 panel; a dark day dilutes the baseline as a true zero") {
    val s = spark
    import s.implicits._
    val name = "ewma-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[EwmaStream.Order]
    val q = EwmaStream.ewmaQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-ewma").toString, W)
    val fed = scala.collection.mutable.ArrayBuffer.empty[EwmaStream.Order]
    def feed(es: EwmaStream.Order*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      // batch 1: two adjacent days
      feed(order(1, "2024-01-01", 3.0), order(2, "2024-01-02", 6.0))
      val st = new InMemoryStore(name)
      val p1 = storePanel(st)
      assert(p1 == batchPanel(fed.toSeq))
      // day2: (600*8 + 300*4)/15 = 400 -> spike 600/400
      assert(p1("2024-01-02") == ((600L, 400L, Some(15000L))))
      // batch 2: a second order on a published day + a day past a gap
      // (01-04: day 01-03 is dark and must dilute as a zero)
      feed(order(3, "2024-01-02", 1.5), order(4, "2024-01-04", 3.0))
      val p2 = storePanel(st)
      assert(p2 == batchPanel(fed.toSeq))
      // day2 absolute total moved to 750 -> (750*8 + 300*4)/15 = 480
      assert(p2("2024-01-02") == ((750L, 480L, Some(15625L))))
      // day4: (300*8 + 750*2 + 300*1)/15 = 280 (dark day 3 paid 0)
      assert(p2("2024-01-04") == ((300L, 280L, Some(10714L))))
      // batch 3: far-future day — whole kernel is its own mass
      feed(order(5, "2024-02-01", 15.0))
      val p3 = storePanel(st)
      assert(p3 == batchPanel(fed.toSeq))
      assert(p3("2024-02-01") == ((1500L, 800L, Some(18750L))))
    } finally q.stop()
  }

  test("replaying an applied batch is a no-op; zero-baseline day publishes no spike row") {
    val s = spark
    import s.implicits._
    val name = "ewma-replay"
    InMemoryStore.clear(name)
    // 0-cent day: floor(0*8/15) = 0 baseline -> ewma 0, NO spike key
    val batch = Seq(("2024-03-01", 0L), ("2024-03-02", 450L))
      .toDF("day", "cents")
    EwmaStream.ewmaBatch(InMemoryProvider(name), W)(batch, 0L)
    val st = new InMemoryStore(name)
    val before = storePanel(st)
    EwmaStream.ewmaBatch(InMemoryProvider(name), W)(batch, 0L)
    assert(storePanel(st) == before)
    assert(before("2024-03-01") == ((0L, 0L, None)))
    // day2: (450*8 + 0*4)/15 = 240
    assert(before("2024-03-02") == ((450L, 240L, Some(18750L))))
  }
}
