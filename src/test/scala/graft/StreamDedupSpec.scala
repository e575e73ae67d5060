package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.Doc

class StreamDedupSpec extends SparkSpec {

  private val T0 = 1767225600000L // 2026-01-01 00:00:00 UTC
  private def ts(offsetS: Long) = new Timestamp(T0 + offsetS * 1000)

  private def runStream(batches: Seq[Seq[Doc]], delay: String = "10 minutes") = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Doc]
    val ckpt = Files.createTempDirectory("graft-sd").toString
    val q = StreamDedup.dedupedDocs(mem.toDF(), delay)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(s"dedup_out_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(q.name).as[Doc].collect().toSeq
    } finally q.stop()
  }

  test("same-batch and cross-batch replays within the watermark are dropped") {
    val out = runStream(Seq(
      Seq(Doc(1, "the same page", ts(0)),
        Doc(2, "the same page", ts(10)),      // same-batch dup
        Doc(3, "another page", ts(20))),
      Seq(Doc(4, "the same page", ts(30)),    // cross-batch dup
        Doc(5, "a third page", ts(40)))))
    assert(out.map(_.doc_id).sorted == Seq(1L, 3L, 5L))
  }

  test("first copy wins; distinct texts all pass") {
    val out = runStream(Seq(Seq(
      Doc(7, "alpha", ts(0)), Doc(8, "beta", ts(1)), Doc(9, "alpha", ts(2)))))
    assert(out.map(_.doc_id).sorted == Seq(7L, 8L))
  }

  test("a replay after state eviction passes through (bounded-state contract)") {
    val out = runStream(Seq(
      Seq(Doc(1, "page x", ts(0))),
      // watermark pusher: event far past ts(0) + delay evicts the state
      Seq(Doc(2, "unrelated", ts(10000))),
      Seq(Doc(3, "page x", ts(10010)))), // replay after eviction -> emitted
      delay = "10 seconds")
    assert(out.map(_.doc_id).sorted == Seq(1L, 2L, 3L))
  }

  test("null texts share one key: first passes, replays within delay drop") {
    val out = runStream(Seq(Seq(
      Doc(1, null, ts(0)), Doc(2, null, ts(5)), Doc(3, "real", ts(6)))))
    assert(out.map(_.doc_id).sorted == Seq(1L, 3L))
  }
}
