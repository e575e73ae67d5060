package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Market
import graft.streaming.{SessionStream, TransitionStream}

/** Streaming transition monitor: exact count parity with the q91
  * batch matrix on in-order streams, session isolation, straggler
  * skip. */
class TransitionStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  private def ev(id: Long, user: Long, offsetS: Long, typ: String) =
    SessionStream.Ev(user, id, new Timestamp(T0 + offsetS * 1000L), typ)

  private def runSteps(batches: Seq[Seq[SessionStream.Ev]]): Seq[TransitionStream.Step] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val out = TransitionStream.steps(mem.toDF())
    val q = out.writeStream
      .format("memory").queryName("steps_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-trans").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("steps_out").as[TransitionStream.Step].collect().toSeq
    } finally q.stop()
  }

  test("step counts across a batch split equal the batch q91 matrix") {
    val evs = Seq(
      ev(0, 1, 0, "view"), ev(1, 1, 60, "click"), ev(2, 1, 120, "click"),
      ev(3, 1, 180, "purchase"),
      ev(4, 2, 0, "view"), ev(5, 2, 60, "click"),
      ev(6, 2, 11000, "purchase"), // new session for user 2
      ev(7, 3, 0, "signup"))
    // split mid-user-1-session: state must carry the pair chain over
    val got = runSteps(Seq(evs.take(2), evs.drop(2)))
      .groupBy(s => (s.prev_type, s.next_type))
      .view.mapValues(_.size.toLong).toMap
    val s = spark
    import s.implicits._
    val batch = evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val want = Market.transitions(batch)
      .select("prev_type", "next_type", "transitions")
      .as[(String, String, Long)].collect()
      .map { case (p, n, c) => (p, n) -> c }.toMap
    assert(got == want)
  }

  test("no step crosses the session gap") {
    val got = runSteps(Seq(Seq(
      ev(0, 1, 0, "click"), ev(1, 1, 2000, "view")))) // 2000s > 1800s gap
    assert(got.isEmpty)
  }

  test("a straggler behind consumed state is skipped, not paired") {
    val got = runSteps(Seq(
      Seq(ev(0, 1, 100, "view"), ev(1, 1, 200, "click")),
      Seq(ev(2, 1, 150, "error"), // late: behind last consumed (200s)
        ev(3, 1, 300, "purchase"))))
    assert(got.map(s => (s.prev_type, s.next_type)).toSet ==
      Set(("view", "click"), ("click", "purchase")))
  }

  test("updateUser transition function: in-batch sort + gap + straggler unit") {
    val state = new TestGroupState[TransitionStream.LastEv]
    val out = TransitionStream.updateUser(1800L)(7L, Iterator(
      ev(2, 7, 120, "c"), ev(1, 7, 60, "b"), ev(0, 7, 0, "a")), state)
    assert(out.map(s => (s.prev_type, s.next_type)).toSeq ==
      Seq(("a", "b"), ("b", "c")))
    assert(state.get == TransitionStream.LastEv((T0 + 120000L) * 1000L, "c"))
  }
}
