package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Market
import graft.streaming.ScoreStream

/** Events-wire row for ScoreStreamSpec's MemoryStream (top level —
  * an inner case class has no zero-arg outer path for the encoder). */
case class ScoreRaw(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Streaming model-accuracy monitor: exact total parity with the
  * q177 batch backtest on a split log, cold-start coverage, session
  * isolation, straggler skip. */
class ScoreStreamSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC — before the test split
  private val T0 = 1704067200000L

  private type Raw = ScoreRaw

  private def ev(id: Long, user: Long, offsetS: Long, item: Long) =
    ScoreRaw(id, new Timestamp(T0 + offsetS * 1000L), user, "view", 1.0,
      s"""{"k":"$item"}""")

  private def toDf(evs: Seq[Raw]): DataFrame = {
    val s = spark
    import s.implicits._
    evs.toDF()
  }

  private def runScored(model: DataFrame,
      batches: Seq[Seq[Raw]]): Seq[org.apache.spark.sql.Row] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[ScoreRaw]
    val q = ScoreStream.scoredSteps(mem.toDF(), model)
      .writeStream
      .format("memory").queryName("scored_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-score").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("scored_out").collect().toSeq
    } finally q.stop()
  }

  test("stream totals == the q177 batch backtest on the same split log") {
    // train half (before the split): user 1 establishes 7→8→9 twice,
    // so the model says predict(7)=8, predict(8)=9
    val train = Seq(
      ev(0, 1, 0, 7), ev(1, 1, 60, 8), ev(2, 1, 120, 9),
      ev(3, 2, 0, 7), ev(4, 2, 60, 8), ev(5, 2, 120, 9),
      ev(6, 3, 0, 5), ev(7, 3, 60, 6))
    // test half (after the split, here T0+1 day): hits, misses, and a
    // cold-start prev item (42) the model never saw
    val day = 86400L
    val test = Seq(
      ev(10, 4, day, 7), ev(11, 4, day + 60, 8),       // hit
      ev(12, 4, day + 120, 5),                          // miss (8→5, want 9)
      ev(13, 5, day, 42), ev(14, 5, day + 60, 7),       // cold prev 42
      ev(15, 5, day + 7200, 8))                         // new session: no step
    val splitDate = "2024-01-02"

    val model = Market.majorityNextItemModel(toDf(train))
    // split mid-user-4-session so state carries across micro-batches
    val scored = runScored(model, Seq(test.take(2), test.drop(2)))
    val got = (scored.size.toLong,
      scored.map(_.getAs[Long]("covered")).sum,
      scored.map(_.getAs[Long]("hit")).sum)

    val batch = Market.nextItemBacktest(toDf(train ++ test), splitDate)
      .collect().head
    assert(got == ((batch.getAs[Long]("n_test"),
      batch.getAs[Long]("n_covered"), batch.getAs[Long]("n_hits"))))
    // and the rolled-up report matches the batch row exactly
    val s = spark
    val roll = ScoreStream.accuracy(
      s.createDataFrame(s.sparkContext.parallelize(scored),
        s.table("scored_out").schema)).collect().head
    assert(roll.getAs[Long]("acc_bp") == batch.getAs[Long]("acc_bp"))
    assert(roll.getAs[Long]("covered_acc_bp") ==
      batch.getAs[Long]("covered_acc_bp"))
  }

  test("cold-start prev item: counted, not covered, never a hit") {
    val model = Market.majorityNextItemModel(toDf(Seq(
      ev(0, 1, 0, 7), ev(1, 1, 60, 8))))
    val scored = runScored(model, Seq(Seq(
      ev(10, 2, 0, 42), ev(11, 2, 60, 7))))
    assert(scored.size == 1)
    assert(scored.head.getAs[Long]("covered") == 0L)
    assert(scored.head.getAs[Long]("hit") == 0L)
    assert(scored.head.getAs[Long]("prev_item") == 42L)
  }

  test("no step crosses the session gap") {
    val model = Market.majorityNextItemModel(toDf(Seq(
      ev(0, 1, 0, 7), ev(1, 1, 60, 8))))
    val scored = runScored(model, Seq(Seq(
      ev(10, 2, 0, 7), ev(11, 2, 2000, 8)))) // 2000s > 1800s gap
    assert(scored.isEmpty)
  }

  test("a straggler behind consumed state is skipped, not paired") {
    val model = Market.majorityNextItemModel(toDf(Seq(
      ev(0, 1, 0, 7), ev(1, 1, 60, 8))))
    val scored = runScored(model, Seq(
      Seq(ev(10, 2, 100, 7), ev(11, 2, 200, 8)),
      Seq(ev(12, 2, 150, 9),  // late: behind last consumed (200s)
        ev(13, 2, 300, 9))))
    assert(scored.map(r => (r.getAs[Long]("prev_item"),
      r.getAs[Long]("next_item"))).toSet == Set((7L, 8L), (8L, 9L)))
  }

  test("updateUser unit: in-batch sort + gap + timeout reclaim") {
    val state = new TestGroupState[ScoreStream.LastItem]
    val out = ScoreStream.updateUser(1800L)(7L, Iterator(
      ScoreStream.IEv(7L, 2L, new Timestamp(T0 + 60000L), 8L),
      ScoreStream.IEv(7L, 1L, new Timestamp(T0), 7L)), state).toSeq
    assert(out.map(s => (s.prev_item, s.next_item)) == Seq((7L, 8L)))
    assert(state.getOption.contains(ScoreStream.LastItem(
      (T0 + 60000L) * 1000L, 8L)))
  }
}
