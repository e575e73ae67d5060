package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Sessionize
import graft.streaming.BotStream
import graft.streaming.BotStream.{Ev, Open, Verdict}

/** Streaming bot detection: exact verdict parity with the q112 batch
  * operator once sessions close, across batch splits; state-function
  * unit behavior. */
class BotStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  final case class RawEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  private def ev(id: Long, user: Long, offsetS: Long) =
    RawEv(id, new Timestamp(T0 + offsetS * 1000L), user, "click", 1.0, "{}")

  // fixture thresholds: low floors so both verdict paths fire
  private val MinE = 3L
  private val Fast = 15000000L
  private val Jit = 1000000L

  private def runVerdicts(batches: Seq[Seq[RawEv]]): Seq[Verdict] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[RawEv]
    val out = BotStream.verdicts(mem.toDF(), minEvents = MinE,
      fastGapUs = Fast, jitterUs = Jit)
    val name = s"bot_out_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-bot").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(ev(900001L, 999999L, 100000L)); q.processAllAvailable()
      mem.addData(ev(900002L, 999999L, 100001L)); q.processAllAvailable()
      spark.table(name).as[Verdict].collect().toSeq
        .filter(_.user_id != 999999L)
    } finally q.stop()
  }

  private def batchDf(evs: Seq[RawEv]) = {
    val s = spark
    import s.implicits._
    evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Batch verdicts re-keyed to the stream's (user_id, start_us). */
  private def batchVerdicts(evs: Seq[RawEv]): Map[(Long, Long), Verdict] = {
    val starts = Sessionize.assignSessions(batchDf(evs))
      .groupBy(col("session_id"))
      .agg(min(col("ts_us")).as("start_us"))
    Sessionize.botSessions(batchDf(evs), minEvents = MinE,
      fastGapUs = Fast, jitterUs = Jit)
      .join(starts, "session_id")
      .collect().map { r =>
        def opt(c: String) =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        val v = Verdict(r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("n_events"), r.getAs[Long]("duration_s"),
          opt("min_gap_us"), opt("max_gap_us"), opt("sum_gap_us"),
          opt("avg_gap_us"), r.getAs[Int]("flag_fast"),
          r.getAs[Int]("flag_metronome"), r.getAs[Int]("is_bot"))
        (v.user_id, v.start_us) -> v
      }.toMap
  }

  test("stream verdicts across a mid-session batch split equal the q112 batch operator") {
    val evs = Seq(
      // user 1: metronome — 4 events 20 s apart
      ev(0, 1, 0), ev(1, 1, 20), ev(2, 1, 40), ev(3, 1, 60),
      // user 2: fast — gaps 1, 25, 1, 1 s
      ev(10, 2, 0), ev(11, 2, 1), ev(12, 2, 26), ev(13, 2, 27), ev(14, 2, 28),
      // user 3: single-event session, then a second session after the gap
      ev(20, 3, 0), ev(21, 3, 4000), ev(22, 3, 4010))
    val got = runVerdicts(Seq(evs.take(2), evs.slice(2, 10), evs.drop(10)))
      .map(v => (v.user_id, v.start_us) -> v).toMap
    val want = batchVerdicts(evs)
    assert(got == want)
    assert(got((1L, T0 * 1000L)).flag_metronome == 1)
    assert(got((2L, T0 * 1000L)).flag_fast == 1)
    assert(got((3L, T0 * 1000L)).n_events == 1L &&
      got((3L, T0 * 1000L)).min_gap_us.isEmpty)
  }

  test("updateSession unit: gap closes the old session mid-stream; straggler skipped") {
    val state = new TestGroupState[Open]
    def e(id: Long, offsetS: Long) = Ev(7L, id, new Timestamp(T0 + offsetS * 1000L))
    val out1 = BotStream.updateSession(1800L, MinE, Fast, Jit)(7L,
      Iterator(e(0, 0), e(1, 20), e(2, 40), e(3, 4000)), state).toSeq
    assert(out1.length == 1)
    val v = out1.head
    assert(v.n_events == 3L && v.min_gap_us.contains(20000000L) &&
      v.flag_metronome == 1 && v.is_bot == 1)
    assert(state.get.n == 1L)
    // straggler older than consumed state: ignored entirely
    val out2 = BotStream.updateSession(1800L, MinE, Fast, Jit)(7L,
      Iterator(e(4, 100)), state).toSeq
    assert(out2.isEmpty && state.get.n == 1L)
  }

  test("verdictOf: mean-vs-spread independence (fast-but-jittery, slow-but-regular)") {
    // gaps 1 s and 25 s: mean 13 s < 15 s (fast) but spread 24 s (no metronome)
    val fastJitter = Open(0L, 26000000L, 3L, 1000000L, 25000000L, 26000000L)
    val vf = BotStream.verdictOf(fastJitter, MinE, Fast, Jit)
    assert(vf.flag_fast == 1 && vf.flag_metronome == 0)
    // gaps 20 s, 20 s: mean 20 s ≥ 15 s (not fast) but spread 0 (metronome)
    val slowRegular = Open(0L, 40000000L, 3L, 20000000L, 20000000L, 40000000L)
    val vs = BotStream.verdictOf(slowRegular, MinE, Fast, Jit)
    assert(vs.flag_fast == 0 && vs.flag_metronome == 1)
  }
}
