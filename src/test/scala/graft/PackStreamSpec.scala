package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.streaming.PackStream

class PackStreamSpec extends SparkSpec {

  final case class In(doc_id: Long, text: String)

  private def run(batches: Seq[Seq[In]], shards: Int, seqLen: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[In]
    val q = PackStream.packed(mem.toDF(), shards, seqLen)
      .writeStream.outputMode("append").format("memory")
      .queryName(s"pack_out_${System.nanoTime()}")
      .option("checkpointLocation", Files.createTempDirectory("graft-ps").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(q.name).as[(Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    } finally q.stop()
  }

  test("stream packing equals the batch twin when arrival follows doc_id order") {
    val s = spark
    import s.implicits._
    val docs = (1L to 9L).map(i => In(i, (1L to i).map(t => s"t$t").mkString(" ")))
    val streamed = run(Seq(docs.take(4), docs.drop(4)), shards = 2, seqLen = 5L)
    val batch = graft.ops.TrainingPrep.packSequences(
        docs.map(d => (d.doc_id, d.text, "en", "s")).toDF("doc_id", "text", "lang", "source"),
        shards = 2, seqLen = 5L)
      .select("doc_id", "shard", "token_count", "start_offset", "seq_id")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("shard offsets persist across batches (state carries, O(1)/shard)") {
    // one shard; 3-token docs; seqLen 4 ⇒ doc1 seq0, doc2 starts at 3
    // (seq 0), doc3 (arriving in a LATER batch) starts at 6 ⇒ seq 1
    val out = run(Seq(
      Seq(In(1, "a b c"), In(2, "d e f")),
      Seq(In(3, "g h i"))), shards = 1, seqLen = 4L)
    assert(out == Seq(
      (1L, 0L, 3L, 0L, 0L),
      (2L, 0L, 3L, 3L, 0L),
      (3L, 0L, 3L, 6L, 1L)))
  }

  test("packShard transition: batch-internal order is doc_id, not arrival") {
    val state = new TestGroupState[Long]
    val out = PackStream.packShard(10L)(0L,
      Iterator((5L, 0L, 4L), (2L, 0L, 7L)), state).toSeq
    assert(out.map(p => (p.doc_id, p.start_offset)) == Seq((2L, 0L), (5L, 7L)))
    assert(state.value.contains(11L))
  }

  /** Minimal GroupState stub for direct transition-function tests. */
  private final class TestGroupState[T] extends org.apache.spark.sql.streaming.GroupState[T] {
    var value: Option[T] = None
    override def exists: Boolean = value.isDefined
    override def get: T = value.get
    override def getOption: Option[T] = value
    override def update(t: T): Unit = value = Some(t)
    override def remove(): Unit = value = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = ()
    override def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
