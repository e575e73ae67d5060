package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{ConvertStream, SessionStream}

/** Streaming conversion-latency monitor: exact parity with the q154
  * batch grain on in-order streams, pre-funnel purchases ignored,
  * emit-once under replayed purchases, attribution-window cut. */
class ConvertStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  private def ev(id: Long, user: Long, offsetS: Long, typ: String) =
    SessionStream.Ev(user, id, new Timestamp(T0 + offsetS * 1000L), typ)

  private def run(batches: Seq[Seq[SessionStream.Ev]],
      windowSeconds: Long = 7 * 86400L): Seq[ConvertStream.Conversion] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val out = ConvertStream.conversions(mem.toDF(),
      windowSeconds = windowSeconds)
    val name = s"conv_out_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-conv").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[ConvertStream.Conversion].collect().toSeq
    } finally q.stop()
  }

  /** The q154 fixture from OpsSpec, streamed: u1 converts (10 s), u2
    * has only a pre-click purchase, u3's early purchase is ignored
    * but the later one converts (60 s), u4 never converts, u5 never
    * clicks. */
  private def fixture: Seq[SessionStream.Ev] = Seq(
    ev(1, 1, 0, "click"), ev(2, 1, 10, "purchase"),
    ev(3, 2, 0, "purchase"), ev(4, 2, 5, "click"),
    ev(5, 3, 0, "purchase"), ev(6, 3, 5, "click"),
    ev(7, 3, 65, "purchase"),
    ev(8, 4, 0, "click"),
    ev(9, 5, 0, "purchase"))

  test("streamed conversions equal the q154 batch grain across a batch split") {
    val s = spark
    import s.implicits._
    // split mid-user-3-funnel: the click anchor must carry over
    val got = run(Seq(fixture.take(6), fixture.drop(6)))
      .map(c => c.user_id -> c.delay_s).toMap
    val batch = graft.ops.Integrity
      .conversionDelays(
        fixture.map(e => (e.event_id, e.ts, e.user_id, e.event_type))
          .toDF("event_id", "ts", "user_id", "event_type"),
        "click", "purchase")
      .filter(org.apache.spark.sql.functions.col("delay_s").isNotNull)
      .select("user_id", "delay_s")
      .as[(Long, Long)].collect().toMap
    assert(batch == Map(1L -> 10L, 3L -> 60L)) // fixture sanity
    assert(got == batch)
  }

  test("events arriving after the watermark passed the user's window do not kill the query (timeout clamp)") {
    // u1's natural timeout (click + 60 s) is long past once u2's
    // events push the watermark hours ahead; the batch-2 straggler
    // purchase must be a silent no-op, not a setTimeoutTimestamp
    // IllegalArgumentException that terminates the stream
    val got = run(Seq(
      Seq(ev(1, 1, 0, "click"), ev(2, 2, 10000, "click")),
      Seq(ev(3, 1, 10050, "purchase"), ev(4, 2, 10020, "purchase"))),
      windowSeconds = 60L)
    // u1: outside its window; u2: converts within its own
    assert(got.map(c => (c.user_id, c.delay_s)) == Seq((2L, 20L)))
  }

  test("a purchase sharing the first click's timestamp converts with delay 0 (batch tie semantics)") {
    // batch anchors t_from = min click ts and counts any purchase with
    // ts >= t_from — event ids are never consulted; the stream must
    // anchor the click before consuming the same-ts purchase even
    // when the purchase has the smaller id
    val got = run(Seq(Seq(ev(1, 1, 0, "purchase"), ev(2, 1, 0, "click"))))
    assert(got.map(c => (c.user_id, c.delay_s)) == Seq((1L, 0L)))
  }

  test("a replayed purchase emits nothing (tombstone); a purchase outside the window emits nothing") {
    // duplicate purchase delivery in a later batch — still one row
    val dup = run(Seq(
      Seq(ev(1, 1, 0, "click"), ev(2, 1, 10, "purchase")),
      Seq(ev(2, 1, 10, "purchase"))))
    assert(dup.map(c => (c.user_id, c.delay_s)) == Seq((1L, 10L)))
    // purchase lands 100 s after the click with a 60 s window: no row
    val late = run(Seq(
      Seq(ev(1, 1, 0, "click"), ev(2, 1, 100, "purchase"))),
      windowSeconds = 60L)
    assert(late.isEmpty)
  }
}
