package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Ingestion-time near-duplicate detection against an indexed corpus
  * — the streaming half of `Dedup.incrementalDedupKept`: as documents
  * arrive, flag the ones whose MinHash bands collide with the
  * existing corpus index and whose exact shingle Jaccard confirms the
  * match. The published result is the flagged PAIR list (new doc ×
  * corpus doc + jaccard_bp), the T4-blacklist shape: a downstream
  * sink drops flagged ids; "passes the gate" cannot be an operator
  * here because stream-static ANTI join is unsupported.
  *
  * Why this streams well: every per-document step is STATELESS — the
  * fused MinHashSig signature is a per-row map, banding is a 4-way
  * explode, the index probe is a stream-static equi-join on
  * (band, band_hash) re-planned each micro-batch, and the exact
  * Jaccard verify is per-row array arithmetic on the joined pair. The
  * only state is the final within-watermark pair dedup (a candidate
  * pair can surface in up to NumBands bands), bounded at 2 ids + a
  * timestamp per recent pair. The corpus index is a static frame:
  * rebuild/extend it batch-side (e.g. nightly) and restart the query,
  * the same cadence `incrementalDedupKept` implies.
  */
object NearDupStream {

  /** One streamed document. */
  final case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Batch-side: the corpus LSH index — one row per (band, band_hash)
    * bucket membership, carrying the shingle set for the verify step.
    * Persist/write this once; it is the static join side. */
  def corpusIndex(corpus: DataFrame): DataFrame =
    Dedup.lshBands(Dedup.minhashSignature(corpus), keep = Seq("shingles"))
      .select(col("doc_id").as("corpus_doc_id"),
        col("shingles").as("corpus_shingles"),
        col("band"), col("band_hash"))

  /** Streaming: verified near-dup pairs (doc_id, corpus_doc_id,
    * jaccard_bp) for arriving docs vs the index, append-mode. */
  def matches(stream: DataFrame, index: DataFrame,
      thresholdBp: Long = 8000L, delay: String = "10 minutes"): DataFrame = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    val banded = Dedup.lshBands(
      Dedup.minhashSignature(stream.filter(col("text").isNotNull)
        .withWatermark("ts", delay)),
      keep = Seq("shingles", "ts"))
    // verify via the batch path's own jaccardCols — one formula, no
    // batch/stream drift
    Dedup.jaccardCols(banded
        .join(index, Seq("band", "band_hash"))
        .withColumnRenamed("shingles", "sh_a")
        .withColumnRenamed("corpus_shingles", "sh_b"))
      .filter(col("jaccard_bp") >= thresholdBp)
      .select(col("doc_id"), col("corpus_doc_id"), col("jaccard_bp"), col("ts"))
      // a pair can arrive via up to NumBands colliding bands — dedup
      // within the watermark (state: one row per recent flagged pair)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_doc_id")
      .drop("ts")
  }
}
