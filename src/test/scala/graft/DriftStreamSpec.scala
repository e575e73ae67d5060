package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.DriftStream

/** Streaming value-distribution drift: exact TVD parity with the q109
  * batch op, cross-batch refinement, replay idempotence, no-reference
  * drop semantics. */
class DriftStreamSpec extends SparkSpec {

  // 2026-01-01 00:00:00 UTC; split for the batch twin is day 2
  private val T0 = 1767225600000L
  private val Split = "2026-01-03"

  private def ev(id: Long, et: String, day: Int, v: Double) =
    DriftStream.Event(id, et, new Timestamp(T0 + day * 86400000L), v)

  /** ref days 0-1, cur days 3-4; two types with different shifts. */
  private def series: (Seq[DriftStream.Event], Seq[DriftStream.Event]) = {
    var id = 0L
    def mk(et: String, day: Int, vs: Seq[Double]) =
      vs.map { v => id += 1; ev(id, et, day, v) }
    val ref = mk("a", 0, Seq(5, 15, 15, 25)) ++ mk("b", 1, Seq(5, 5, 35))
    val cur = mk("a", 3, Seq(5, -3, 35, 35, 95)) ++ mk("b", 4, Seq(5, 35, 35))
    (ref, cur)
  }

  test("streamed TVD equals the q109 batch op on the same events, across batches") {
    val s = spark
    import s.implicits._
    val store = "drift-parity"
    InMemoryStore.clear(store)
    val (ref, cur) = series
    DriftStream.loadReference(
      ref.toDF(), InMemoryProvider(store), bucketWidth = 10.0, nBuckets = 4)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[DriftStream.Event]
    val q = DriftStream.driftQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-drift").toString,
      bucketWidth = 10.0, nBuckets = 4)
    try {
      val (b1, b2) = cur.splitAt(cur.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = new InMemoryStore(store).scan("value_drift")
        .map { case (k, v) => k.head -> v }.toMap
      val batch = graft.ops.Retention
        .valueDrift((ref ++ cur).map(e => (e.event_type, e.ts, e.value))
          .toDF("event_type", "ts", "value"),
          splitDate = Split, bucketWidth = 10.0, nBuckets = 4)
        .select("event_type", "tvd_bp")
        .as[(String, Long)].collect().toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set("a", "b"))
    } finally q.stop()
  }

  test("mid-stream TVD moves as the current distribution fills in") {
    val s = spark
    import s.implicits._
    val store = "drift-move"
    InMemoryStore.clear(store)
    val (ref, _) = series
    DriftStream.loadReference(
      ref.toDF(), InMemoryProvider(store), bucketWidth = 10.0, nBuckets = 4)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[DriftStream.Event]
    val q = DriftStream.driftQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-drift").toString,
      bucketWidth = 10.0, nBuckets = 4)
    try {
      val st = new InMemoryStore(store)
      // batch 1: a's current matches its reference exactly → TVD 0
      mem.addData(Seq(ev(100, "a", 3, 5), ev(101, "a", 3, 15),
        ev(102, "a", 3, 15), ev(103, "a", 3, 25)): _*)
      q.processAllAvailable()
      assert(st.scan("value_drift").toMap == Map(List("a") -> 0L))
      // batch 2: pile into the top bucket → drift appears, same key
      mem.addData(Seq(ev(104, "a", 4, 35), ev(105, "a", 4, 35),
        ev(106, "a", 4, 35), ev(107, "a", 4, 35)): _*)
      q.processAllAvailable()
      val tvd = st.scan("value_drift").toMap.apply(List("a"))
      // ref (2500,5000,2500,0) vs cur (1250,2500,1250,5000) → 5000
      assert(tvd == 5000L)
    } finally q.stop()
  }

  test("driftBatch replay is a no-op; a type without reference writes no drift row") {
    val s = spark
    import s.implicits._
    val store = "drift-replay"
    InMemoryStore.clear(store)
    val st = new InMemoryStore(store)
    st.put("drift_ref", Seq("a", "0"), 2L)
    st.put("drift_ref", Seq("a", "1"), 2L)
    val batch = Seq(("a", "0", 1L), ("a", "1", 3L), ("zz", "0", 5L))
      .toDF("event_type", "bucket", "cnt")
    DriftStream.driftBatch(InMemoryProvider(store))(batch, 0L)
    val once = (st.scan("drift_count").toMap, st.scan("value_drift").toMap)
    // ref (5000,5000) vs cur (2500,7500) → tvd 2500; zz has no ref
    assert(once._2 == Map(List("a") -> 2500L))
    DriftStream.driftBatch(InMemoryProvider(store))(batch, 0L)
    assert((st.scan("drift_count").toMap, st.scan("value_drift").toMap) == once)
  }
}
