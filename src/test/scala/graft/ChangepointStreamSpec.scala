package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Retention
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.{ChangepointStream, TrailingStream}

/** Streaming change-point monitor: exact parity with the q334 batch
  * binseg across batch splits (including a dark-day gap the dense
  * spine must zero-fill), replay idempotence, walk unit. */
class ChangepointStreamSpec extends SparkSpec {

  private def order(id: Long, day: String, price: Double) =
    TrailingStream.Order(id, Timestamp.valueOf(s"$day 12:00:00"), price)

  private def batchRow(events: Seq[TrailingStream.Order])
      : Map[String, Long] = {
    val s = spark
    import s.implicits._
    val orders = events.map(e => (e.order_id, e.order_ts, e.total_price))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = Retention.changepoint(orders).collect().head
    val daynum = java.time.LocalDate
      .parse(r.getAs[String]("split_day")).toEpochDay
    Map("split_daynum" -> daynum,
      "n_days" -> r.getAs[Long]("n_days"),
      "n_before" -> r.getAs[Long]("n_before"),
      "n_after" -> r.getAs[Long]("n_after"),
      "mean_before_cents" -> r.getAs[Long]("mean_before_cents"),
      "mean_after_cents" -> r.getAs[Long]("mean_after_cents"),
      "delta_cents" -> r.getAs[Long]("delta_cents"),
      "score_cents" -> r.getAs[Long]("score_cents"))
  }

  private def storeRow(st: InMemoryStore): Map[String, Long] =
    st.scan(ChangepointStream.ResultTable)
      .map { case (k, v) => k.head -> v }.toMap

  test("streamed change point equals batch q334 across splits incl. a dark gap") {
    val s = spark
    import s.implicits._
    val name = "changepoint-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[TrailingStream.Order]
    val q = ChangepointStream.changepointQuery(mem.toDF(),
      InMemoryProvider(name),
      Files.createTempDirectory("graft-changepoint").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[TrailingStream.Order]
    def feed(es: TrailingStream.Order*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      val st = new InMemoryStore(name)
      feed(order(1, "2024-01-01", 1.0), order(2, "2024-01-02", 1.0),
        order(3, "2024-01-03", 5.0))
      assert(storeRow(st) == batchRow(fed.toSeq), "after batch 1")
      // the shift sharpens; Jan 5 dark — spine must zero-fill it
      feed(order(4, "2024-01-04", 5.0), order(5, "2024-01-06", 5.0))
      assert(storeRow(st) == batchRow(fed.toSeq), "after the gap")
      // in-watermark fold into the latest day moves the argmax math
      feed(order(6, "2024-01-06", 2.0))
      assert(storeRow(st) == batchRow(fed.toSeq), "after late fold")
    } finally q.stop()
  }

  test("changepointWalk unit: the $1→$5 step pins the q334 hand numbers") {
    // days 0..7: 100¢ ×4 then 500¢ ×4 — A=−6400, B=16 at τ=4
    val ledger = (0 until 8).map(i =>
      (19700L + i) -> (if (i < 4) 100L else 500L)).toMap
    assert(ChangepointStream.changepointWalk(ledger) ==
      Some((19703L, 8L, 4L, 4L, 100L, 500L, -400L, 1600L)))
    // sub-2-day ledgers have no admissible split
    assert(ChangepointStream.changepointWalk(Map(19700L -> 5L)).isEmpty)
    assert(ChangepointStream.changepointWalk(Map.empty).isEmpty)
  }

  test("replaying a day's put is a no-op (absolute ledger)") {
    val s = spark
    import s.implicits._
    val name = "changepoint-replay"
    InMemoryStore.clear(name)
    val batch = Seq((19723L, 150L), (19724L, 300L))
      .toDF("daynum", "cents")
    ChangepointStream.changepointBatch(InMemoryProvider(name))(batch, 0L)
    ChangepointStream.changepointBatch(InMemoryProvider(name))(batch, 0L)
    val st = new InMemoryStore(name)
    assert(st.scan(ChangepointStream.DayTable).toMap ==
      Map(Seq("19723") -> 150L, Seq("19724") -> 300L))
    assert(storeRow(st)("n_days") == 2L)
  }
}
