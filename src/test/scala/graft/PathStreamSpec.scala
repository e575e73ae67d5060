package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Sessionize
import graft.streaming.{PathStream, SessionStream}

/** Streaming session paths: exact report parity with the q127 batch
  * op (in-stream closes + timeout closes), prefix truncation with
  * whole-session conversion, bounded prefix state. */
class PathStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  private def ev(id: Long, user: Long, offsetS: Long, typ: String) =
    SessionStream.Ev(user, id, new Timestamp(T0 + offsetS * 1000L), typ)

  private def runJourneys(
      batches: Seq[Seq[SessionStream.Ev]]): Seq[PathStream.Journey] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val q = PathStream.journeys(mem.toDF()).writeStream
      .format("memory").queryName("paths_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-path").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("paths_out").as[PathStream.Journey].collect().toSeq
    } finally q.stop()
  }

  test("journeys closed in-stream match the batch q127 report (incl. truncation + conversion)") {
    val evs = Seq(
      // user 1: 6 steps, purchase beyond the 5-step prefix
      ev(0, 1, 0, "view"), ev(1, 1, 60, "click"), ev(2, 1, 120, "view"),
      ev(3, 1, 180, "click"), ev(4, 1, 240, "view"), ev(5, 1, 300, "purchase"),
      // a 2h-later event closes user 1's session in-stream
      ev(6, 1, 8000, "signup"),
      // user 2: same truncated prefix, never converts; closed in-stream
      ev(7, 2, 0, "view"), ev(8, 2, 60, "click"), ev(9, 2, 120, "view"),
      ev(10, 2, 180, "click"), ev(11, 2, 240, "view"),
      ev(12, 2, 8000, "error"))
    val got = runJourneys(Seq(evs.take(5), evs.drop(5)))
    val closed = got.map(j => (j.path, j.n_events, j.converted)).toSet
    assert(closed == Set(
      ("view>click>view>click>view", 6L, 1),
      ("view>click>view>click>view", 5L, 0)))
    // the shared-prefix rollup agrees with batch q127 on the SAME rows
    val s = spark
    import s.implicits._
    val batchIn = evs.filter(e => e.event_id <= 5 || (e.event_id >= 7 && e.event_id <= 11))
      .map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val want = Sessionize.sessionPaths(batchIn, maxSteps = 5, k = 20)
      .select("path", "n_sessions", "n_converted")
      .as[(String, Long, Long)].collect().toSet
    val streamReport = PathStream.report(
      got.filter(j => j.n_events >= 5).toDF(), k = 20)
      .select("path", "n_sessions", "n_converted")
      .as[(String, Long, Long)].collect().toSet
    assert(streamReport == want)
  }

  /** TestGroupState + controllable timeout/removal observation. */
  private final class TimeoutState[T]
      extends org.apache.spark.sql.streaming.GroupState[T] {
    var value: Option[T] = None
    var timedOut = false
    var removed = false
    override def exists: Boolean = value.isDefined
    override def get: T = value.get
    override def getOption: Option[T] = value
    override def update(t: T): Unit = { value = Some(t); removed = false }
    override def remove(): Unit = { value = None; removed = true }
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(ms: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = ()
    override def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("prefix state stops growing past maxSteps but n_events and conversion keep counting") {
    val state = new TestGroupState[PathStream.Open]
    val evs = (0 until 9).map(i => ev(i.toLong, 3, i * 10L, "view")) :+
      ev(9, 3, 90, "purchase")
    val out = PathStream.updateUser(1800L, 3, "purchase")(3L,
      evs.iterator, state)
    assert(out.isEmpty) // session still open
    val o = state.get
    assert(o.prefix == Seq("view", "view", "view")) // capped at 3
    assert(o.nEvents == 10L && o.converted)
  }

  test("timeout close emits the buffered journey once") {
    val state = new TimeoutState[PathStream.Open]
    PathStream.updateUser(1800L, 5, "purchase")(9L,
      Iterator(ev(0, 9, 0, "view")), state)
    state.timedOut = true
    val out = PathStream.updateUser(1800L, 5, "purchase")(9L,
      Iterator.empty, state).toSeq
    assert(out.map(j => (j.path, j.n_events, j.converted)) ==
      Seq(("view", 1L, 0)))
    assert(state.removed)
  }
}
