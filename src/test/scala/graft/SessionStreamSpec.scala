package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SessionStream
import graft.streaming.SessionStream.Ev

/** Streaming sessionization (flatMapGroupsWithState + event-time
  * timeout) — gap semantics, cross-batch continuation, and parity with
  * the batch sessionizer. */
class SessionStreamSpec extends SparkSpec {

  // 2026-01-01 00:00:00 UTC, in ms
  private val T0 = 1767225600000L
  private def ts(offsetS: Long) = new Timestamp(T0 + offsetS * 1000)

  private def runStream(batches: Seq[Seq[Ev]], gapSeconds: Long = 1800L) = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("graft-ss").toString
    val q = SessionStream.closedSessions(mem.toDF(), gapSeconds)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(s"sess_out_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(q.name).as[SessionStream.ClosedSession].collect().toSeq
    } finally q.stop()
  }

  test("gap closes a session; next event opens seq+1; cross-batch continuation") {
    val out = runStream(Seq(
      // batch 1: user 1 session 1 (two events), still open
      Seq(Ev(1, 1, ts(0), "view"), Ev(1, 2, ts(60), "click")),
      // batch 2: continuation within gap, then a 1-hour gap → session 2
      Seq(Ev(1, 3, ts(120), "view"), Ev(1, 4, ts(5000), "purchase")),
      // batch 3: watermark pusher from another user far in the future
      Seq(Ev(99, 9, ts(100000), "view"))))
    val u1 = out.filter(_.user_id == 1).sortBy(_.session_id)
    // session 1_1 closed by the gap inside batch 2
    assert(u1.map(_.session_id).contains("1_1"))
    val s1 = u1.find(_.session_id == "1_1").get
    assert(s1.step_length == 3 && s1.visit_length_s == 120)
    // session 1_2 closed by event-time TIMEOUT once watermark passed
    val s2 = u1.find(_.session_id == "1_2")
    assert(s2.isDefined, s"timeout session missing: $out")
    assert(s2.get.step_length == 1)
  }

  test("after a timeout, the user's next session continues the seq (no duplicate ids)") {
    val out = runStream(Seq(
      Seq(Ev(1, 1, ts(0), "view")),          // session 1_1 opens
      Seq(Ev(99, 8, ts(50000), "view")),     // watermark → 1_1 closes by TIMEOUT
      Seq(Ev(1, 2, ts(60000), "view")),      // user 1 returns → must be 1_2
      Seq(Ev(99, 9, ts(500000), "view"))))   // watermark → 1_2 closes
    val ids = out.filter(_.user_id == 1).map(_.session_id).sorted
    assert(ids == Seq("1_1", "1_2"), s"got $ids from $out")
  }

  test("built-in session_window agrees with the custom sessionizer on step counts") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("graft-sw").toString
    val q = graft.streaming.SessionStream.closedSessionWindows(mem.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName(s"sw_out_${System.nanoTime()}")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(
        Ev(1, 1, ts(0), "view", Some(1.005)),                 // session A: 2 steps
        Ev(1, 2, ts(60), "click", Some(2.0)),
        Ev(1, 3, ts(5000), "view"),                           // session B: 1 step
        Ev(2, 4, ts(0), "view"))                              // user 2: 1 step
      q.processAllAvailable()
      mem.addData(Ev(99, 9, ts(100000), "view")) // watermark pusher
      q.processAllAvailable()
      val got = s.table(q.name)
        .select(col("user_id"), col("step_length"), col("event_types"),
          col("total_value_cents")).as[(Long, Long, String, Long)]
        .collect().toSeq.sorted
      // session A: floor(1.005*100)=floor(100.4999...)=100, + 200 cents
      assert(got == Seq((1L, 1L, "view", 0L), (1L, 2L, "click,view", 300L),
        (2L, 1L, "view", 0L)))
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicates within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("graft-dd").toString
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id") // A8 on a stream; state bounded by watermark
      .writeStream.outputMode("append").format("memory")
      .queryName(s"dd_out_${System.nanoTime()}")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(
        Ev(1, 1, ts(0), "view"), Ev(1, 1, ts(0), "view"), // dup in batch
        Ev(1, 2, ts(10), "click"))
      q.processAllAvailable()
      mem.addData(Ev(1, 1, ts(0), "view")) // dup across batches
      q.processAllAvailable()
      assert(s.table(q.name).count() == 2)
    } finally q.stop()
  }

  test("late event within gap of the open session extends BOTH ends of its span") {
    // batch 1 opens [1000, 1060]; batch 2 delivers a late-but-within-
    // watermark event at 500 (wm after batch 1 = 1060-600 = 460): it
    // must merge AND pull start_us back so visit_length_s counts it.
    val out = runStream(Seq(
      Seq(Ev(1, 1, ts(1000), "view"), Ev(1, 2, ts(1060), "click")),
      Seq(Ev(1, 3, ts(500), "view")),
      Seq(Ev(99, 9, ts(100000), "view")))) // timeout pusher
    val s1 = out.find(_.session_id == "1_1").get
    assert(s1.step_length == 3, s"got $out")
    assert(s1.visit_length_s == 560, s"start not extended backward: $out")
  }

  test("straggler older than gap before the open session forms its own earlier session") {
    // gap=100s, wm delay 600s. Batch 1 opens a session at t=3000
    // (wm -> 2400). Batch 2's straggler at t=2500 is within the
    // watermark but >gap before the open session's start: event-time
    // order says it is its OWN earlier session; the open session is
    // renumbered after it.
    val out = runStream(Seq(
      Seq(Ev(1, 1, ts(3000), "view")),
      Seq(Ev(1, 2, ts(2500), "view")),
      Seq(Ev(99, 9, ts(100000), "view"))), gapSeconds = 100L)
    val u1 = out.filter(_.user_id == 1).sortBy(_.session_id)
    assert(u1.map(_.session_id) == Seq("1_1", "1_2"), s"got $out")
    val first = u1.head
    assert(first.start_us == ts(2500).getTime * 1000L && first.step_length == 1)
    val second = u1(1)
    assert(second.start_us == ts(3000).getTime * 1000L && second.step_length == 1)
  }

  test("updateUser transition function: straggler + span-extension paths (direct)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def usOf(sec: Long) = (T0 + sec * 1000) * 1000L
    // open session [1000s, 1060s], seq 3
    val open = SessionStream.OpenSession(3L, usOf(1000), usOf(1060), 2L)

    // (a) late event gap-close BEFORE start extends the span backward
    val stA = TestGroupState.create[SessionStream.OpenSession](
      org.apache.spark.api.java.Optional.of(open), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val outA = SessionStream.updateUser(1800L)(
      1L, Iterator(Ev(1, 7, ts(500), "view")), stA).toSeq
    assert(outA.isEmpty)
    assert(stA.get == SessionStream.OpenSession(3L, usOf(500), usOf(1060), 3L,
      Set("view"), 0L))

    // (b) straggler more than gap before start: closes as its own
    // session under the CURRENT seq; open session renumbered seq+1
    val stB = TestGroupState.create[SessionStream.OpenSession](
      org.apache.spark.api.java.Optional.of(open), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val outB = SessionStream.updateUser(100L)(
      1L, Iterator(Ev(1, 8, ts(200), "view")), stB).toSeq
    assert(outB.map(_.session_id) == Seq("1_3"), s"got $outB")
    assert(outB.head.start_us == usOf(200) && outB.head.end_us == usOf(200))
    assert(stB.get == SessionStream.OpenSession(4L, usOf(1000), usOf(1060), 2L))
  }

  test("T8: restart from checkpoint continues sessions and seq numbering") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("graft-restart").toString
    // foreachBatch sink: unlike the memory sink it SUPPORTS restart
    // from a checkpoint (the reference's T8/HA path)
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[SessionStream.ClosedSession]
    def start() = SessionStream.closedSessions(mem.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[SessionStream.ClosedSession], _: Long) =>
          b.collect().foreach(collected.add)
      }
      .start()

    // life 1: open a session for user 1, then stop mid-stream
    val q1 = start()
    try {
      mem.addData(Ev(1, 1, ts(0), "view"), Ev(1, 2, ts(60), "click"))
      q1.processAllAvailable()
    } finally q1.stop()

    // life 2: same checkpoint — state (open session, seq) must carry
    // over; a continuation event joins session 1_1, then a gap opens
    // 1_2, then the watermark closes everything
    val q2 = start()
    try {
      mem.addData(Ev(1, 3, ts(120), "view"))
      q2.processAllAvailable()
      mem.addData(Ev(1, 4, ts(5000), "purchase"))
      q2.processAllAvailable()
      mem.addData(Ev(99, 9, ts(100000), "view"))
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val out = collected.asScala.toSeq
        .filter(_.user_id == 1L).distinct.sortBy(_.session_id)
      assert(out.map(_.session_id) == Seq("1_1", "1_2"), s"got $out")
      val s1 = out.head
      assert(s1.step_length == 3 && s1.visit_length_s == 120,
        s"restart lost open-session state: $s1")
    } finally q2.stop()
  }

  test("parity with batch Sessionize on replayed history (full A1 grain)") {
    val s = spark
    import s.implicits._
    // deterministic multi-user history with event types and values,
    // all sessions closed by a far-future event
    val types = Vector("view", "click", "purchase")
    val evs = for {
      u <- 1L to 5L; k <- 0L until 6L
    } yield Ev(u, u * 100 + k, ts(k * 600 + u * 13 + (if (k >= 3) 7200 else 0)),
      types((u + k).toInt % 3), Some(u * 1.5 + k * 0.245))
    val pusher = Ev(999L, 0L, ts(1000000), "view")
    val streamed = runStream(Seq(evs, Seq(pusher)))
      .filter(_.user_id != 999L)
      .map(c => (c.user_id, c.session_id, c.step_length, c.visit_length_s,
        c.event_types, c.total_value_cents))
      .sortBy(x => (x._1, x._2))

    val batchDf = evs.toDF()
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
    val batch = graft.ops.Sessionize.assignSessions(batchDf)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("step_length"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / 1000000L)
          .cast("long").as("visit_length_s"),
        concat_ws(",", array_sort(collect_set(col("event_type")))).as("event_types"),
        coalesce(sum(floor(col("value") * lit(100.0))), lit(0L))
          .as("total_value_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
      .sortBy(x => (x._1, x._2))
      .toSeq
    assert(streamed == batch)
  }

  test("cents convention: floor(x*100) — stream equals batch on 2.675 (shortest-repr vs binary rounding trap)") {
    val s = spark
    import s.implicits._
    // 2.675 prints as "2.675" but its binary value is 2.67499999...:
    // decimal(18,2) HALF_UP of the shortest repr gives 2.68 (268 cents)
    // while the exact binary expansion rounds to 2.67. The house
    // convention floor(2.675*100)=floor(267.4999...)=267 sidesteps the
    // ambiguity — assert both engines land there.
    val evs = Seq(Ev(1, 1, ts(0), "purchase", Some(2.675)))
    val streamed = runStream(Seq(evs, Seq(Ev(99, 9, ts(100000), "view"))))
      .filter(_.user_id == 1)
    assert(streamed.map(_.total_value_cents) == Seq(267L))
    val batch = graft.ops.Sessionize(evs.toDF()
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value")))
      .collect()
    assert(batch.map(_.getAs[Long]("total_value_cents")).toSeq == Seq(267L))
  }
}
