package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.ClickJoinStream

object ClickJoinStreamSpec {
  // top-level: Spark can't encode inner classes of a test instance
  case class Imp(ad_id: Long, impression_id: Long, ts: Timestamp)
  case class Click(ad_id: Long, click_id: Long, ts: Timestamp)
}

/** Stream-stream interval join: exact parity with the batch twin on
  * the same rows, window gating, and bounded state via watermarks. */
class ClickJoinStreamSpec extends SparkSpec {
  import ClickJoinStreamSpec.{Click, Imp}

  // 2024-01-01 00:00:00 UTC
  private val T0 = 1704067200000L

  private def imp(ad: Long, id: Long, offsetS: Long) =
    Imp(ad, id, new Timestamp(T0 + offsetS * 1000L))
  private def clk(ad: Long, id: Long, offsetS: Long) =
    Click(ad, id, new Timestamp(T0 + offsetS * 1000L))

  private def run(imps: Seq[Seq[Imp]], clicks: Seq[Seq[Click]])
      : Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val im = MemoryStream[Imp]
    val cm = MemoryStream[Click]
    val out = ClickJoinStream.attributedClicks(im.toDF(), cm.toDF())
    val q = out.writeStream
      .format("memory").queryName("attr_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cjoin").toString)
      .start()
    try {
      imps.zipAll(clicks, Seq.empty[Imp], Seq.empty[Click]).foreach {
        case (ib, cb) =>
          if (ib.nonEmpty) im.addData(ib: _*)
          if (cb.nonEmpty) cm.addData(cb: _*)
          q.processAllAvailable()
      }
      spark.table("attr_out")
        .select("ad_id", "impression_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("in-window clicks attribute; out-of-window and cross-ad clicks don't — parity with the batch twin") {
    val imps = Seq(imp(1, 10, 0), imp(1, 11, 300), imp(2, 20, 0))
    val clicks = Seq(
      clk(1, 100, 60),   // in window of imp 10 (and not 11: 60 < 300)
      clk(1, 101, 550),  // in window of BOTH imp 10 (<=600) and imp 11
      clk(1, 102, 700),  // in window of imp 11 only (700-0 > 600)
      clk(2, 200, 650),  // in window of imp 20? 650 > 600 → no match
      clk(3, 300, 10))   // ad never impressed
    val got = run(Seq(imps), Seq(Seq.empty, clicks))
    val want = Set(
      (1L, 10L, 100L), (1L, 10L, 101L), (1L, 11L, 101L), (1L, 11L, 102L))
    assert(got == want)
    // batch twin on identical static frames
    val s = spark
    import s.implicits._
    val batch = ClickJoinStream
      .attributedClicksBatch(imps.toDF(), clicks.toDF())
      .select("ad_id", "impression_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == want)
  }

  test("the join condition carries the time bound (state is evictable, not forever)") {
    // the analyzed plan must constrain click_ts by imp_ts on both
    // sides — Spark derives state watermarks from exactly this
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val im = MemoryStream[Imp]
    val cm = MemoryStream[Click]
    val joined = ClickJoinStream.attributedClicks(im.toDF(), cm.toDF())
    val cond = joined.queryExecution.analyzed.toString
    assert(cond.contains("click_ts") && cond.contains("imp_ts"),
      s"range conjunct missing from the join:\n$cond")
  }

  test("outer join: unattributed impressions emit only after the watermark passes their window") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val im = MemoryStream[Imp]
    val cm = MemoryStream[Click]
    val out = ClickJoinStream.attributionOutcome(im.toDF(), cm.toDF())
    val q = out.writeStream
      .format("memory").queryName("outcome_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cjoin-o").toString)
      .start()
    try {
      // imp 60 (ad 2) never clicked; imp 61 (ad 1) clicked in-window
      im.addData(imp(2, 60, 0), imp(1, 61, 30))
      cm.addData(clk(1, 600, 90))
      q.processAllAvailable()
      def rows() = spark.table("outcome_out")
        .select("impression_id", "attributed")
        .as[(Long, Int)].collect().toSet
      // attributed row is out immediately; the unattributed one must
      // NOT have emitted yet (its window could still be hit)
      assert(rows() == Set((61L, 1)))
      // advance the watermark far past imp 60's window end + slack
      im.addData(imp(9, 999, 20000))
      cm.addData(clk(9, 9999, 20001))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows().contains((60L, 0)), s"outer row never evicted: ${rows()}")
    } finally q.stop()
  }

  test("a click arriving in a later batch still attributes within the watermark slack") {
    val got = run(
      Seq(Seq(imp(5, 50, 0)), Seq.empty),
      Seq(Seq.empty, Seq(clk(5, 500, 120))))
    assert(got == Set((5L, 50L, 500L)))
  }
}
