package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Sessionize
import graft.streaming.{AttributionStream, SessionStream}

/** Streaming attribution: exact report parity with the q124 batch op
  * on in-order streams (including mid-session batch splits), direct
  * credit at session opens, straggler skip, state-function unit. */
class AttributionStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  private def ev(id: Long, user: Long, offsetS: Long, typ: String) =
    SessionStream.Ev(user, id, new Timestamp(T0 + offsetS * 1000L), typ)

  private def runCredits(
      batches: Seq[Seq[SessionStream.Ev]]): Seq[AttributionStream.Credit] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val out = AttributionStream.credits(mem.toDF())
    val q = out.writeStream
      .format("memory").queryName("credits_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-attr").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("credits_out").as[AttributionStream.Credit].collect().toSeq
    } finally q.stop()
  }

  private val journeys = Seq(
    // user 1: view → click → purchase in one session
    ev(0, 1, 0, "view"), ev(1, 1, 300, "click"), ev(2, 1, 600, "purchase"),
    // user 2: solo purchase, then a 2h-later session signup → purchase
    ev(3, 2, 0, "purchase"),
    ev(4, 2, 9000, "signup"), ev(5, 2, 9300, "purchase"),
    // user 3: view → purchase → purchase (repeat credit)
    ev(6, 3, 0, "view"), ev(7, 3, 60, "purchase"), ev(8, 3, 120, "purchase"))

  private def reportMap(credits: Seq[AttributionStream.Credit]) = {
    val s = spark
    import s.implicits._
    AttributionStream.report(credits.toDF())
      .collect()
      .map(r => (r.getAs[String]("model"), r.getAs[String]("channel")) ->
        ((r.getAs[Long]("conversions"), r.getAs[Long]("share_bp")))).toMap
  }

  test("credit report across a mid-session batch split equals batch q124") {
    // split inside user 1's and user 3's sessions (first/last state
    // must carry over the boundary) while keeping batches globally
    // time-ordered: a batch whose max event time races ahead advances
    // the WATERMARK past another user's still-open session and the
    // engine would (correctly) drop those rows as late
    val Seq(e0, e1, e2, e3, e4, e5, e6, e7, e8) = journeys
    val got = reportMap(runCredits(Seq(
      Seq(e0, e3, e6, e7),  // up to 60s; u1/u3 sessions open
      Seq(e1, e8, e2),      // 120-600s; closes u1/u3 journeys
      Seq(e4, e5))))        // the 2.5h-later u2 session
    val s = spark
    import s.implicits._
    val batch = journeys.map(e => (e.event_id, e.ts, e.user_id, e.event_type,
      1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val want = Sessionize.attribution(batch).collect()
      .map(r => (r.getAs[String]("model"), r.getAs[String]("channel")) ->
        ((r.getAs[Long]("conversions"), r.getAs[Long]("share_bp")))).toMap
    assert(got == want)
  }

  test("a conversion opening a session credits direct under both models") {
    val got = runCredits(Seq(Seq(ev(0, 9, 0, "purchase"))))
    assert(got.map(c => (c.first_touch, c.last_touch)) ==
      Seq(("direct", "direct")))
  }

  test("a straggler behind consumed state cannot change a credit") {
    val got = runCredits(Seq(
      Seq(ev(0, 1, 100, "view"), ev(1, 1, 200, "click")),
      // late signup at 150s: behind consumed state — skipped; the
      // purchase still credits (view, click)
      Seq(ev(2, 1, 150, "signup"), ev(3, 1, 300, "purchase"))))
    assert(got.map(c => (c.first_touch, c.last_touch)) ==
      Seq(("view", "click")))
  }

  test("updateUser unit: in-batch sort, gap reset, repeat purchases") {
    val state = new TestGroupState[AttributionStream.Sess]
    val out = AttributionStream.updateUser(1800L, "purchase")(7L, Iterator(
      ev(2, 7, 120, "purchase"), ev(0, 7, 0, "view"), ev(1, 7, 60, "purchase"),
      ev(3, 7, 5000, "purchase")), state) // 5000s: gap exceeded → direct
    assert(out.map(c => (c.first_touch, c.last_touch)).toSeq == Seq(
      ("view", "view"),       // first purchase
      ("view", "purchase"),   // repeat purchase credits the earlier one
      ("direct", "direct")))  // new session opened by the conversion
    assert(state.get ==
      AttributionStream.Sess((T0 + 5000000L) * 1000L, "purchase", "purchase"))
  }
}
