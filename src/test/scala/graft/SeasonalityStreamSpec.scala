package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Retention
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.{SeasonalityStream, TrailingStream}

/** Streaming seasonality panel: exact parity with the q301 batch
  * autocorrelation across batch splits (including a calendar gap the
  * dense spine must zero-fill), replay idempotence, walk unit. */
class SeasonalityStreamSpec extends SparkSpec {

  private def order(id: Long, day: String, price: Double) =
    TrailingStream.Order(id, Timestamp.valueOf(s"$day 12:00:00"), price)

  private def batchPanel(events: Seq[TrailingStream.Order], lags: Seq[Int])
      : Map[Long, (Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    val orders = events.map(e => (e.order_id, e.order_ts, e.total_price))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    Retention.autocorrelation(orders, lags).collect()
      .map(r => r.getAs[Long]("lag_days") ->
        ((r.getAs[Long]("n_pairs"),
          Option(r.get(r.fieldIndex("r_bp"))).map(_.toString.toLong))))
      .toMap
  }

  private def storePanel(st: InMemoryStore): Map[Long, (Long, Option[Long])] =
    st.scan(SeasonalityStream.PairsTable).map { case (k, np) =>
      k.head.toLong ->
        ((np, st.get(SeasonalityStream.RTable, k)))
    }.toMap

  test("streamed autocorrelation equals batch q301 across batch splits incl. a dark gap") {
    val s = spark
    import s.implicits._
    val name = "seasonality-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val lags = Seq(1, 2)
    val mem = MemoryStream[TrailingStream.Order]
    val q = SeasonalityStream.seasonalityQuery(mem.toDF(),
      InMemoryProvider(name),
      Files.createTempDirectory("graft-seasonality").toString, lags)
    val fed = scala.collection.mutable.ArrayBuffer.empty[TrailingStream.Order]
    def feed(es: TrailingStream.Order*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      val st = new InMemoryStore(name)
      feed(order(1, "2024-01-01", 1.0), order(2, "2024-01-02", 3.0),
        order(3, "2024-01-03", 1.0))
      assert(storePanel(st) == batchPanel(fed.toSeq, lags), "after batch 1")
      // a dark day (Jan 4 skipped) — the ledger walk must zero-fill
      feed(order(4, "2024-01-05", 3.0), order(5, "2024-01-06", 1.0))
      assert(storePanel(st) == batchPanel(fed.toSeq, lags), "after the gap")
      // late row inside the watermark folds into an existing day
      feed(order(6, "2024-01-06 ".trim, 2.0))
      assert(storePanel(st) == batchPanel(fed.toSeq, lags), "after late fold")
    } finally q.stop()
  }

  test("autocorrWalk unit: alternating ledger reproduces the q301 hand numbers") {
    val ledger = (0 until 8).map(i =>
      (19723L + i) -> (if (i % 2 == 0) 100L else 300L)).toMap
    val got = SeasonalityStream.autocorrWalk(ledger, Seq(1, 2))
    assert(got == Seq((1, 7L, Some(-8750L)), (2, 6L, Some(7500L))))
  }

  test("replaying a day's put is a no-op (absolute ledger)") {
    val s = spark
    import s.implicits._
    val name = "seasonality-replay"
    InMemoryStore.clear(name)
    val batch = Seq((19723L, 150L), (19724L, 300L))
      .toDF("daynum", "cents")
    SeasonalityStream.seasonalityBatch(InMemoryProvider(name), Seq(1))(batch, 0L)
    SeasonalityStream.seasonalityBatch(InMemoryProvider(name), Seq(1))(batch, 0L)
    val st = new InMemoryStore(name)
    assert(st.scan(SeasonalityStream.DayTable).toMap ==
      Map(Seq("19723") -> 150L, Seq("19724") -> 300L))
  }
}
