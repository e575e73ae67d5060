package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Market
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.{SessionStream, StationaryStream}

/** Streaming stationary mix: parity with the q350 batch ladder on
  * in-order streams across batch splits, walk unit. */
class StationaryStreamSpec extends SparkSpec {

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC

  private def ev(id: Long, user: Long, offsetS: Long, typ: String) =
    SessionStream.Ev(user, id, new Timestamp(T0 + offsetS * 1000L), typ)

  private def batchMix(events: Seq[SessionStream.Ev], iters: Int)
      : Map[(String, String), Long] = {
    val s = spark
    import s.implicits._
    val df = events.map(e => (e.event_id, e.ts, e.user_id, e.event_type,
      1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    Market.stationaryMix(df, iters).collect().flatMap { r =>
      val t = r.getAs[String]("event_type")
      Seq((t, "stationary_ppm") -> r.getAs[Long]("stationary_ppm"),
        (t, "empirical_ppm") -> r.getAs[Long]("empirical_ppm"),
        (t, "delta_ppm") -> r.getAs[Long]("delta_ppm"))
    }.toMap
  }

  private def storeMix(st: InMemoryStore): Map[(String, String), Long] =
    st.scan(StationaryStream.MixTable)
      .map { case (k, v) => (k(0), k(1)) -> v }.toMap

  test("streamed mix equals batch q350 across batch splits") {
    val s = spark
    import s.implicits._
    val name = "stationary-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val q = StationaryStream.mixQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-stationary").toString, iters = 5)
    val fed = scala.collection.mutable.ArrayBuffer.empty[SessionStream.Ev]
    def feed(es: SessionStream.Ev*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      val st = new InMemoryStore(name)
      // user 1: view → click → view; split mid-session — the step
      // chain must carry over the batch boundary
      feed(ev(0, 1, 0, "view"), ev(1, 1, 60, "click"))
      feed(ev(2, 1, 120, "view"), ev(3, 2, 0, "click"),
        ev(4, 2, 60, "view"))
      assert(storeMix(st) == batchMix(fed.toSeq, 5), "after batch 2")
      // a second user-2 session (past the gap) adds a purchase sink
      feed(ev(5, 2, 10000, "view"), ev(6, 2, 10060, "purchase"))
      assert(storeMix(st) == batchMix(fed.toSeq, 5), "after batch 3")
    } finally q.stop()
  }

  test("replaying a step batch is a no-op (ledger-guarded increments)") {
    val s = spark
    import s.implicits._
    val name = "stationary-replay"
    InMemoryStore.clear(name)
    val batch = Seq((1L, "view", "click", 0L), (2L, "view", "click", 0L),
      (3L, "click", "purchase", 0L))
      .toDF("user_id", "prev_type", "next_type", "ts_us")
    StationaryStream.mixBatch(InMemoryProvider(name), 3)(batch, 7L)
    StationaryStream.mixBatch(InMemoryProvider(name), 3)(batch, 7L)
    val st = new InMemoryStore(name)
    assert(st.scan(StationaryStream.MatrixTable).toMap == Map(
      List("view", "click") -> 2L, List("click", "purchase") -> 1L))
  }

  test("stationaryWalk unit: sink absorbs mass; uniform 2-cycle stays put") {
    val sink = StationaryStream.stationaryWalk(
      Map(("click", "view") -> 1L, ("view", "view") -> 2L), iters = 5)
    assert(sink == Seq(
      ("click", 0L, 0L, 0L),
      ("view", 1000000L, 1000000L, 0L)))
    val cyc = StationaryStream.stationaryWalk(
      Map(("click", "view") -> 2L, ("view", "click") -> 2L), iters = 4)
    assert(cyc == Seq(
      ("click", 500000L, 500000L, 0L),
      ("view", 500000L, 500000L, 0L)))
    assert(StationaryStream.stationaryWalk(Map.empty).isEmpty)
  }
}
