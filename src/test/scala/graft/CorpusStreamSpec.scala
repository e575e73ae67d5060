package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.CorpusStream
import graft.streaming.CorpusStream.In

class CorpusStreamSpec extends SparkSpec {

  private val T0 = 1767225600000L
  private def ts(offsetS: Long) = new Timestamp(T0 + offsetS * 1000)
  private val good = (1 to 30).map(i => s"word$i").mkString(" ")

  private def run(batches: Seq[Seq[In]],
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None,
      modelGate: Boolean = false)
      : Map[(String, String), (Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[In]
    val ckpt = Files.createTempDirectory("graft-cs").toString
    val q = CorpusStream.acceptedCounts(mem.toDF(), benchBloom = bloom,
      modelGate = modelGate)
      .writeStream.outputMode("update").format("memory")
      .queryName(s"corpus_out_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // update mode re-emits a key's row each time it changes: the
      // LAST row per key is the current running total
      spark.table(q.name)
        .as[(String, String, Long, Long)].collect()
        .zipWithIndex
        .groupBy { case ((l, src, _, _), _) => (l, src) }
        .map { case (k, rows) =>
          val ((_, _, n, t), _) = rows.maxBy(_._2); k -> ((n, t)) }
    } finally q.stop()
  }

  test("gates + dedup apply on the stream; totals accumulate across batches") {
    val out = run(Seq(
      Seq(
        In(1, good, "en", "web", ts(0)),
        In(2, good, "en", "web", ts(1)),          // dup of 1 -> dropped
        In(3, "too short", "en", "web", ts(2)),   // quality gate -> dropped
        In(4, good + " extra", "de", "web", ts(3))),
      Seq(
        In(5, good + " more words here", "en", "web", ts(10)), // accepted
        In(6, ("customer " * 30).trim, "en", "web", ts(11)))   // PII gate -> dropped
    ))
    assert(out(("en", "web")) == ((2L, 63L)))  // docs 1 (30 tok) + 5 (33 tok)
    assert(out(("de", "web")) == ((1L, 31L)))
  }

  test("bloom decontamination gate drops benchmark-overlapping docs at ingest") {
    val s = spark
    import s.implicits._
    val benchText = (1 to 8).map(i => s"bench$i").mkString(" ")
    val bloom = graft.ops.Contamination.benchBloom(
      Seq((100L, benchText, "en", "eval", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      expectedGrams = 1000L, fpp = 1e-6)
    val pad = (1 to 25).map(i => s"pad$i").mkString(" ")
    val out = run(Seq(Seq(
      In(1, s"$pad $benchText", "en", "web", ts(0)), // contaminated -> dropped
      In(2, s"$pad clean tail words", "en", "web", ts(1)))), Some(bloom))
    assert(out(("en", "web")) == ((1L, 28L)))        // only doc 2 (25+3 tokens)
  }

  test("model gate on the stream agrees with the batch classifier per text") {
    val s = spark
    import s.implicits._
    // 12 distinct long-enough texts; which pass is the classifier's
    // call — assert stream acceptance == batch keep verdicts exactly
    val texts = (1 to 12).map(i =>
      (1 to 30).map(j => s"tok${i}x$j").mkString(" "))
    val batchKeep = graft.ops.TextAnalysis.qualityClassifier(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "web", 0L) }
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .filter($"keep" === 1).count()
    val out = run(Seq(texts.zipWithIndex.map { case (t, i) =>
      In(i.toLong, t, "en", "web", ts(i.toLong)) }), modelGate = true)
    assert(out.get(("en", "web")).map(_._1).getOrElse(0L) == batchKeep)
    // and the gate is genuinely active on this fixture (not all-pass)
    assert(batchKeep < 12L)
  }
}
