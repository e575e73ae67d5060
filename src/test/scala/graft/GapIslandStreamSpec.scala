package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Retention
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.{GapIslandStream, TrailingStream}

/** Streaming gap islands: parity with the q340 batch walk across
  * batch splits, retroactive gap closure, walk unit. */
class GapIslandStreamSpec extends SparkSpec {

  private def order(id: Long, day: String, price: Double) =
    TrailingStream.Order(id, Timestamp.valueOf(s"$day 12:00:00"), price)

  private def batchGaps(events: Seq[TrailingStream.Order])
      : Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val orders = events.map(e => (e.order_id, e.order_ts, e.total_price))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    Retention.gapIslands(orders).collect().map { r =>
      java.time.LocalDate.parse(r.getAs[String]("gap_start")).toEpochDay ->
        r.getAs[Long]("gap_days")
    }.toMap
  }

  private def storeGaps(st: InMemoryStore): Map[Long, Long] =
    st.scan(GapIslandStream.GapTable)
      .map { case (k, v) => k.head.toLong -> v }.toMap

  test("streamed gaps equal batch q340; a late in-gap order closes it") {
    val s = spark
    import s.implicits._
    val name = "gapisland-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[TrailingStream.Order]
    val q = GapIslandStream.gapQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-gapisland").toString,
      delay = "30 days") // wide watermark: the in-gap fold must land
    val fed = scala.collection.mutable.ArrayBuffer.empty[TrailingStream.Order]
    def feed(es: TrailingStream.Order*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      val st = new InMemoryStore(name)
      feed(order(1, "2024-01-01", 1.0), order(2, "2024-01-05", 2.0))
      assert(storeGaps(st) == batchGaps(fed.toSeq), "after batch 1")
      assert(st.get(GapIslandStream.CensusTable, Seq("n_gaps"))
        .contains(1L))
      assert(st.get(GapIslandStream.CensusTable, Seq("max_gap_days"))
        .contains(3L))
      // a second, later gap
      feed(order(3, "2024-01-08", 3.0))
      assert(storeGaps(st) == batchGaps(fed.toSeq), "after batch 2")
      // a LATE order inside the first gap splits it 3 → 1+1: the
      // replace-per-batch table retracts the stale island
      feed(order(4, "2024-01-03", 4.0))
      assert(storeGaps(st) == batchGaps(fed.toSeq), "after late fill")
      assert(st.get(GapIslandStream.CensusTable, Seq("days_missing"))
        .contains(4L)) // jan 2, jan 4, jan 6, jan 7
    } finally q.stop()
  }

  test("gapWalk unit: bounds, lengths, no-gap and empty ledgers") {
    assert(GapIslandStream.gapWalk(Seq(10L, 11L, 15L, 17L)) ==
      Seq((12L, 3L), (16L, 1L)))
    assert(GapIslandStream.gapWalk(Seq(5L, 6L, 7L)).isEmpty)
    assert(GapIslandStream.gapWalk(Nil).isEmpty)
    assert(GapIslandStream.gapWalk(Seq(3L)).isEmpty)
  }
}
