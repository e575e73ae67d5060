package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.AnomalyStream

/** Streaming volume anomaly: exact parity with the q88 batch op,
  * late-data re-flagging, replay idempotence. */
class AnomalyStreamSpec extends SparkSpec {

  // 2026-01-01 00:00:00 UTC
  private val T0 = 1767225600000L

  private def ev(id: Long, et: String, day: Int, i: Int) =
    AnomalyStream.Event(id, et,
      new Timestamp(T0 + day * 86400000L + i * 1000L))

  /** The q88 spec's series: "a" flat-then-spike, "b" steady jitter. */
  private def series: Seq[AnomalyStream.Event] = {
    val bCounts = Seq(10, 12, 10, 12, 11)
    var id = 0L
    val a = for (d <- 0 to 4; i <- 0 until (if (d == 4) 30 else 10)) yield {
      id += 1; ev(id, "a", d, i)
    }
    val b = for (d <- 0 to 4; i <- 0 until bCounts(d)) yield {
      id += 1; ev(id, "b", d, i)
    }
    a ++ b
  }

  test("streamed flags equal the q88 batch op on the same events") {
    val s = spark
    import s.implicits._
    val store = "anomaly-parity"
    InMemoryStore.clear(store)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[AnomalyStream.Event]
    val q = AnomalyStream.anomalyQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-anomaly").toString)
    try {
      // two batches split mid-series IN EVENT-TIME ORDER (an
      // out-of-order split would legitimately drop day-0 data behind
      // the watermark day-4 events advance): cross-batch state must
      // still converge to the batch answer
      val ordered = series.sortBy(_.ts.getTime)
      val (b1, b2) = ordered.splitAt(ordered.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = new InMemoryStore(store).scan("volume_anomaly")
        .map { case (k, v) => (k.head, k(1)) -> v }.toMap
      val batch = graft.ops.Retention
        .volumeAnomaly(series.map(e => (e.event_type, e.ts))
          .toDF("event_type", "ts"))
        .select("event_type", "day", "is_anomaly")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch)
      assert(streamed(("a", "2026-01-05")) == 1L) // the spike is seen
    } finally q.stop()
  }

  test("late events to an earlier day re-flag the later day they baseline") {
    val s = spark
    import s.implicits._
    val store = "anomaly-late"
    InMemoryStore.clear(store)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[AnomalyStream.Event]
    val q = AnomalyStream.anomalyQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-anomaly").toString)
    try {
      val flat = for (d <- 0 to 3; i <- 0 until 10) yield ev(d * 100L + i, "a", d, i)
      val spike = for (i <- 0 until 30) yield ev(900L + i, "a", 4, i)
      mem.addData(flat ++ spike: _*)
      q.processAllAvailable()
      val st = new InMemoryStore(store)
      assert(st.scanPrefix("volume_anomaly", Seq("a")).toMap
        .apply(List("a", "2026-01-05")) == 1L)
      // +20 LATE events land on day 3 (inside the 2-day watermark of
      // max-seen day 4): day 5's baseline becomes [10,10,10,30] —
      // variance explodes and the spike stops being anomalous
      mem.addData((0 until 20).map(i => ev(800L + i, "a", 3, 100 + i)): _*)
      q.processAllAvailable()
      assert(st.scanPrefix("volume_anomaly", Seq("a")).toMap
        .apply(List("a", "2026-01-05")) == 0L)
    } finally q.stop()
  }

  test("re-flag writes cover only the changed span, not full history") {
    val s = spark
    import s.implicits._
    val store = "anomaly-bound"
    InMemoryStore.clear(store)
    val st = new InMemoryStore(store)
    // 9 days of pre-existing count state, as if written long ago
    (1 to 9).foreach(d => st.put("daily_count", Seq("a", f"2026-01-0$d"), 10L))
    // this batch touches ONLY day 9 (its count becomes a spike)
    val batch = Seq(("a", "2026-01-09", 30L)).toDF("event_type", "day", "cnt")
    AnomalyStream.anomalyBatch(InMemoryProvider(store))(batch, 0L)
    val flags = st.scanPrefix("volume_anomaly", Seq("a")).toMap
    // older days' baselines didn't change — no rewrite of history
    assert(flags.keySet == Set(List("a", "2026-01-09")))
    assert(flags(List("a", "2026-01-09")) == 1L) // 7 flat days, then 30
  }

  test("anomalyBatch replay is a no-op (all writes absolute)") {
    val s = spark
    import s.implicits._
    val store = "anomaly-replay"
    InMemoryStore.clear(store)
    val batch = Seq(
      ("a", "2026-01-01", 10L), ("a", "2026-01-02", 10L),
      ("a", "2026-01-03", 10L), ("a", "2026-01-04", 10L),
      ("a", "2026-01-05", 30L))
      .toDF("event_type", "day", "cnt")
    AnomalyStream.anomalyBatch(InMemoryProvider(store))(batch, 0L)
    val st = new InMemoryStore(store)
    val once = (st.scan("daily_count").toMap, st.scan("volume_anomaly").toMap)
    AnomalyStream.anomalyBatch(InMemoryProvider(store))(batch, 0L)
    assert((st.scan("daily_count").toMap, st.scan("volume_anomaly").toMap) == once)
    assert(once._2(List("a", "2026-01-05")) == 1L)
    assert(once._2(List("a", "2026-01-04")) == 0L) // n=3 < minObs
  }
}
