package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.Doc

/** Streaming near-dup vs corpus index: parity with the batch LSH
  * formulation, cross-batch behavior, band-collision dedup. */
class NearDupStreamSpec extends SparkSpec {

  private val T0 = 1767225600000L
  private def ts(offsetS: Long) = new Timestamp(T0 + offsetS * 1000)

  private def corpusDf(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** The batch twin: LSH candidates (same bands) + exact Jaccard. */
  private def batchPairs(streamDocs: Seq[(Long, String)], corpus: DataFrame,
      thresholdBp: Long): Set[(Long, Long, Long)] = {
    val sigS = Dedup.minhashSignature(corpusDf(streamDocs: _*))
    val sigC = Dedup.minhashSignature(corpus)
    val cand = Dedup.lshBands(sigS).as("a")
      .join(Dedup.lshBands(sigC).as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    Dedup.verifyJaccardSides(cand,
        sigS.select(col("doc_id"), col("shingles")),
        sigC.select(col("doc_id"), col("shingles")))
      .filter(col("jaccard_bp") >= thresholdBp)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("jaccard_bp"))).toSet
  }

  private def runStream(index: DataFrame, batches: Seq[Seq[Doc]],
      thresholdBp: Long = 8000L): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Doc]
    val q = NearDupStream.matches(mem.toDF(), index, thresholdBp)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(s"neardup_out_${System.nanoTime()}")
      .option("checkpointLocation", Files.createTempDirectory("graft-nd").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(q.name).as[(Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  private val LongText = // 24 tokens: 1-token edits stay ≥ 8000 bp
    "spark shuffles data between stages during wide joins and the " +
      "optimizer prunes columns while adaptive execution coalesces " +
      "partitions to balance skewed work across executors"

  private val corpus = corpusDf(
    100L -> "the quick brown fox jumps over the lazy dog tonight",
    101L -> LongText,
    102L -> "entirely different content about cooking pasta dishes")

  test("stream matches == the batch LSH+verify formulation") {
    val arriving = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight", // exact dup
      2L -> (LongText.split(' ').init.mkString(" ") + " machines"), // near dup of 101
      3L -> "completely unrelated text with novel words entirely")
    val got = runStream(NearDupStream.corpusIndex(corpus),
      Seq(arriving.map { case (id, t) => Doc(id, t, ts(id)) })).toSet
    val expect = batchPairs(arriving, corpus, 8000L)
    assert(got == expect)
    assert(got.map(d => (d._1, d._2)) == Set((1L, 100L), (2L, 101L)))
    val nearBp = got.find(_._1 == 2L).get._3
    assert(nearBp >= 8000L && nearBp < 10000L) // near, not exact
  }

  test("exact dup scores 10000 bp; each pair emitted once despite 4 band hits") {
    val got = runStream(NearDupStream.corpusIndex(corpus),
      Seq(Seq(Doc(1, "the quick brown fox jumps over the lazy dog tonight", ts(0)))))
    assert(got == Seq((1L, 100L, 10000L)))
  }

  test("cross-batch arrivals keep matching the static index") {
    val got = runStream(NearDupStream.corpusIndex(corpus), Seq(
      Seq(Doc(1, LongText, ts(0))),
      Seq(Doc(2, LongText, ts(10)),
        Doc(3, "totally novel text appears only in the stream", ts(11)))))
    assert(got.toSet == Set((1L, 101L, 10000L), (2L, 101L, 10000L)))
  }
}
