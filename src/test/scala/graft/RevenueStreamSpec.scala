package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Retention
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.RevenueStream

/** Streaming revenue-seasonality monitor: cross-batch running month
  * totals, index parity with the q183 batch report, replay
  * idempotence. */
class RevenueStreamSpec extends SparkSpec {

  private def ord(id: Long, price: Double, date: String) =
    RevenueStream.Ord(id, price, Timestamp.valueOf(s"$date 12:00:00"))

  /** Orders across three months of two years (month-of-year folds
    * years together, the q183 contract), cents-exercising prices. */
  private def fixture: Seq[RevenueStream.Ord] = Seq(
    ord(1, 100.10, "2024-01-05"), ord(2, 50.555, "2024-01-20"),
    ord(3, 20.00, "2024-02-01"),
    ord(4, 999.99, "2024-07-04"),
    ord(5, 10.01, "2025-01-09"),
    ord(6, 0.07, "2025-07-30"))

  test("streamed month totals + index equal the q183 batch report on a split log") {
    val s = spark
    import s.implicits._
    val store = "rev-test"
    InMemoryStore.clear(store)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[RevenueStream.Ord]
    val q = RevenueStream.revenueQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-rev").toString)
    try {
      val (b1, b2) = fixture.splitAt(3)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val batch = Retention.revenueSeasonality(
        fixture.toDF("order_id", "o_totalprice", "ts")
          .select(col("order_id"), col("o_totalprice"),
            to_date(col("ts")).as("o_orderdate")))
        .collect()
        .map(r => r.getAs[Long]("month").toString ->
          ((r.getAs[Long]("n_orders"), r.getAs[Long]("month_cents"),
            r.getAs[Long]("index_bp")))).toMap
      val st = new InMemoryStore(store)
      val got = st.scan("rev_month_cents").map { case (k, cents) =>
        k.head -> ((st.get("rev_month_orders", k).get, cents,
          st.get("rev_month_index", k).get))
      }.toMap
      assert(got == batch, s"stream=$got batch=$batch")
      // the fixture's month fold: Jan has 3 orders across two years
      assert(got("1")._1 == 3L)
    } finally q.stop()
  }

  test("revenueBatch replay is a no-op (absolute puts + derived index)") {
    val s = spark
    import s.implicits._
    val store = "rev-replay"
    InMemoryStore.clear(store)
    val batch = Seq((1L, 2L, 15010L), (7L, 1L, 99999L))
      .toDF("month", "n_orders", "month_cents")
    RevenueStream.revenueBatch(InMemoryProvider(store))(batch, 0L)
    val st = new InMemoryStore(store)
    val once = RevenueStream.Tables.map(t => st.scan(t).toMap)
    RevenueStream.revenueBatch(InMemoryProvider(store))(batch, 0L)
    assert(RevenueStream.Tables.map(t => st.scan(t).toMap) == once)
    // index math matches the batch column: floor(10000*cents*12/total)
    assert(st.get("rev_month_index", Seq("1")).get ==
      math.floor(10000.0 * 15010L * 12 / 115009L).toLong)
  }
}
