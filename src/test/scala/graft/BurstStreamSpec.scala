package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.BurstStream
import graft.streaming.BurstStream.{Ev, LastSeen, Verdict}

/** Streaming tolerance-window event dedup (25th machine, live q264
  * twin): batch parity of the verdict rollup, cross-batch burst
  * chaining, state timeout, and the covered-span straggler rule. */
class BurstStreamSpec extends SparkSpec {

  private val T0 = 1767225600000L // 2026-01-01 00:00:00 UTC
  private def ts(offsetS: Long) = new Timestamp(T0 + offsetS * 1000)

  private def runStream(batches: Seq[Seq[Ev]], tol: Long = 10L): Seq[Verdict] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("graft-burst").toString
    val q = BurstStream.verdicts(mem.toDF(), tol)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(s"burst_out_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(q.name).as[Verdict].collect().toSeq
    } finally q.stop()
  }

  test("verdict rollup equals the q264 batch report; bursts chain ACROSS batches") {
    val s = spark
    import s.implicits._
    val batches = Seq(
      // batch 1: a burst starts (0s, 5s) and another type is quiet
      Seq(Ev(1, "click", 1, ts(0)), Ev(1, "click", 2, ts(5)),
        Ev(1, "view", 3, ts(0))),
      // batch 2: 9s chains off 5s (cross-batch state); 30s restarts;
      // a second user is independent
      Seq(Ev(1, "click", 4, ts(9)), Ev(1, "click", 5, ts(30)),
        Ev(2, "click", 6, ts(9))))
    val verdicts = runStream(batches)
    val got = verdicts.groupBy(_.event_type).map { case (t, vs) =>
      t -> ((vs.size.toLong, vs.count(_.is_dup == 1).toLong))
    }
    val all = batches.flatten.map(e => (e.user_id, e.event_type, e.event_id, e.ts))
      .toDF("user_id", "event_type", "event_id", "ts")
    val batch = graft.ops.Dedup.eventBurstDedup(all, 10L).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_dups")))).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    // the cross-batch chain specifically: event 4 (9s, gap 4s to the
    // 5s event seen in batch 1) must be a dup
    assert(verdicts.find(_.event_id == 4).exists(_.is_dup == 1))
    assert(verdicts.find(_.event_id == 5).exists(_.is_dup == 0))
  }

  test("step: timeout evicts state; next event is a keeper; covered-span straggler is a dup") {
    val tol = 10L
    // chain within one invocation
    val st1 = new TestGroupState[LastSeen]
    val out1 = BurstStream.step(tol)((1L, "click"),
      Iterator(Ev(1, "click", 1, ts(0)), Ev(1, "click", 2, ts(5))), st1).toSeq
    assert(out1.map(_.is_dup) == Seq(0, 1))
    assert(st1.value.contains(LastSeen(ts(5).getTime * 1000L)))
    // an in-span straggler (arrives later, timestamped earlier) is a
    // dup under the covered-span rule and never moves the span back
    val out2 = BurstStream.step(tol)((1L, "click"),
      Iterator(Ev(1, "click", 3, ts(2))), st1).toSeq
    assert(out2.map(_.is_dup) == Seq(1))
    assert(st1.value.contains(LastSeen(ts(5).getTime * 1000L)))
    // timeout: state removed, a later event starts fresh
    val st2 = new TestGroupState[LastSeen]
    st2.update(LastSeen(ts(0).getTime * 1000L))
    st2.timedOut = true
    assert(BurstStream.step(tol)((1L, "click"), Iterator.empty, st2).isEmpty)
    assert(st2.value.isEmpty)
    st2.timedOut = false
    val out3 = BurstStream.step(tol)((1L, "click"),
      Iterator(Ev(1, "click", 9, ts(100))), st2).toSeq
    assert(out3.map(_.is_dup) == Seq(0))
  }
}
