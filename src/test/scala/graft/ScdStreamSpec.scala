package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Scd
import graft.streaming.{ScdStream, SessionStream}

/** Streaming SCD-2: exact history parity with the q297 batch build on
  * in-order streams (including batch splits landing mid-crossing),
  * same-ts crossing, straggler skip, state-function unit. */
class ScdStreamSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC

  private def ev(id: Long, user: Long, offsetS: Long, typ: String) =
    SessionStream.Ev(user, id, new Timestamp(T0 + offsetS * 1000L), typ)

  private def runVersions(
      batches: Seq[Seq[SessionStream.Ev]]): Seq[ScdStream.Version] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val out = ScdStream.versions(mem.toDF())
    val q = out.writeStream
      .format("memory").queryName("scd_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scd").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("scd_out").as[ScdStream.Version].collect().toSeq
    } finally q.stop()
  }

  private def batchDf(evs: Seq[SessionStream.Ev]) =
    evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  // user 1: view then 4 purchases (crosses 3 on the 3rd purchase);
  // user 2: purchases with the LAST TWO on one timestamp (the second
  // of them crosses) — the same-ts version edge
  private val journeys = Seq(
    ev(0, 1, 0, "view"), ev(1, 1, 60, "purchase"),
    ev(2, 1, 120, "purchase"), ev(3, 1, 180, "purchase"),
    ev(4, 1, 240, "purchase"),
    ev(5, 2, 0, "purchase"), ev(6, 2, 60, "purchase"),
    ev(7, 2, 120, "purchase"), ev(8, 2, 120, "purchase"))

  test("stream history equals batch tierHistory across mid-crossing batch splits") {
    val Seq(e0, e1, e2, e3, e4, e5, e6, e7, e8) = journeys
    val versions = runVersions(Seq(
      Seq(e0, e1, e5),      // tier-0 versions open
      Seq(e2, e3, e6),      // u1 crosses mid-split
      Seq(e4, e7, e8)))     // u2's same-ts crossing pair
    val got = ScdStream.history(versions.toDF())
      .as[(Long, Int, Long, Option[Long])].collect().toSet
    val want = Scd.tierHistory(batchDf(journeys))
      .as[(Long, Int, Long, Option[Long])].collect().toSet
    assert(got == want)
    assert(want.size == 4) // two versions per user
  }

  test("a tier version emits in the batch it crosses, not at stream end") {
    val Seq(e0, e1, e2, e3, _, _, _, _, _) = journeys
    val versions = runVersions(Seq(Seq(e0, e1, e2), Seq(e3)))
    // after batch 1: only the tier-0 open; batch 2 carries the crossing
    assert(versions.map(v => (v.user_id, v.tier)).toSet ==
      Set((1L, 0), (1L, 1)))
  }

  test("straggler behind consumed state is skipped; state function unit") {
    val state = new TestGroupState[ScdStream.TierState]
    val out1 = ScdStream.updateUser(Seq(3L, 10L, 30L))(
      7L, Iterator(ev(1, 7, 100, "purchase")), state).toSeq
    assert(out1 == Seq(ScdStream.Version(7L, 0, (T0 + 100000L) * 1000L)))
    val out2 = ScdStream.updateUser(Seq(3L, 10L, 30L))(
      7L, Iterator(ev(2, 7, 50, "purchase")), state).toSeq
    assert(out2.isEmpty, "straggler must not emit or count")
    assert(state.get.cum == 1L)
  }
}
