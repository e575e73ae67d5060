package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus intake — the q47 selection pipeline applied at
  * ingestion time: content-hash dedup within the watermark
  * ([[StreamDedup]]), then the SAME one-pass quality/PII gates the
  * batch pipeline uses (`CorpusPipeline.gated` — one code path, no
  * batch/stream drift), then running per-(lang, source) acceptance
  * totals as an update-mode stateful aggregation.
  *
  * State: dedup keys are watermark-bounded (32 B/key); the running
  * totals keep one row per (lang, source) — a domain-sized state that
  * never grows with the stream. Output rows are ABSOLUTE totals, so
  * the sink upsert is idempotent (the T5 lesson: per-partition puts,
  * no driver funnel).
  */
object CorpusStream {

  /** One streamed document: the documents-table wire shape plus the
    * ingestion timestamp the watermark rides on. */
  final case class In(doc_id: Long, text: String, lang: String,
      source: String, ts: java.sql.Timestamp)

  /** Accepted-document running totals per (lang, source); run with
    * `outputMode("update")`.
    *
    * `benchBloom` adds the ingestion-time decontamination gate: a
    * Bloom filter over benchmark gram hashes
    * ([[graft.ops.Contamination.benchBloom]]), probed per row —
    * contaminated docs never pass; clean docs are dropped only at the
    * filter's fpp. Stream-safe because it is stateless (the exact
    * join is the batch q55 path). */
  def acceptedCounts(docs: DataFrame, delay: String = "10 minutes",
      minTokens: Long = 20L, maxShortBp: Long = 4000L,
      maxPiiHits: Long = 2L,
      benchBloom: Option[org.apache.spark.util.sketch.BloomFilter] = None,
      contamN: Int = 8,
      modelGate: Boolean = false): DataFrame = {
    val deduped = StreamDedup.byKey(
      docs.withColumn("__th", coalesce(md5(col("text")), lit("<null-text>"))),
      Seq("__th"), "ts", delay).drop("__th")
    val decontaminated = benchBloom.fold(deduped)(b =>
      graft.ops.Contamination.bloomGate(deduped, b, contamN))
    // model-based gate (q69's hashed linear scorer): a zero-shuffle,
    // stateless per-row FILTER — stream-safe by construction, and
    // the same score column as the batch classifier so there is no
    // drift. Null text scores null → dropped, which matches the
    // downstream minTokens gate's verdict for such docs.
    val scored =
      if (!modelGate) decontaminated
      else decontaminated.filter(
        graft.ops.TextAnalysis.classifierScore >= 0L)
    graft.ops.CorpusPipeline.gated(scored, minTokens, maxShortBp, maxPiiHits)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_count")).as("total_tokens"))
  }
}
