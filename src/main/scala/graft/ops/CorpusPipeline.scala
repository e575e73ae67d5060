package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus materialization query — the reason the
  * individual operators exist: documents that (a) pass the quality
  * gate, (b) survive near-dup dedup, and (c) clear the PII-density
  * gate, rolled up to per-(lang, source) document and token totals —
  * the "what goes into the training run" report.
  *
  * Scale shape: all three per-row gates (token count, short-token
  * ratio, PII hits) are computed in ONE projection over the text —
  * one scan, pure codegen, no intermediate frames — and the only
  * shuffle-bearing stage is the dedup itself. The gate join runs at
  * kept-doc grain, the final aggregate at (lang, source) grain.
  */
object CorpusPipeline {

  /** One-pass per-row gates (token count, short-token ratio, PII
    * hits) over any frame carrying `text`: keeps passing rows with
    * `token_count` attached, drops the scratch columns. Null text
    * fails the token gate. Works on batch and streaming frames alike
    * (pure projection + filter). */
  def gated(
      docs: DataFrame,
      minTokens: Long = 20L,
      maxShortBp: Long = 4000L,
      maxPiiHits: Long = 2L): DataFrame =
    docs
      .withColumn("__tokens", expr(TextAnalysis.TokensExpr))
      .withColumn("token_count", size(col("__tokens")).cast("long"))
      .withColumn("__short_bp",
        floor(lit(10000.0) *
          expr("CAST(size(filter(__tokens, x -> length(x) <= 2)) AS BIGINT)") /
          col("token_count")).cast("long"))
      .withColumn("__pii_hits",
        size(regexp_extract_all(col("text"), lit(TextClean.PiiPattern), lit(0)))
          .cast("long"))
      .filter(col("token_count") >= minTokens &&
        col("__short_bp") <= maxShortBp && col("__pii_hits") <= maxPiiHits)
      .drop("__tokens", "__short_bp", "__pii_hits")

  def corpusSelect(
      docs: DataFrame,
      minTokens: Long = 20L,
      maxShortBp: Long = 4000L,
      maxPiiHits: Long = 2L): DataFrame =
    Dedup.ngramDedupKept(docs)
      .join(gated(docs, minTokens, maxShortBp, maxPiiHits)
        .select(col("doc_id"), col("token_count")), "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("token_count")).as("total_tokens"))

  /** Corpus snapshot diff — the versioning report between two corpus
    * materializations: per source, how many documents were added,
    * removed, changed (same id, different content — NULL-safe md5
    * compare), or unchanged. What a data-ops team reviews before
    * promoting a new snapshot to training.
    *
    * Scale shape: ONE full-outer co-partitioned join on doc_id (at
    * 100 TB, write snapshots bucketed by doc_id and this join is
    * shuffle-free), content compared as md5 so wide text never
    * travels past the projection, then a metadata-grain rollup to
    * source. A removed doc reports under its OLD source; added and
    * changed under the NEW. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("__oh"),
      col("source").as("__osrc"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("__nh"),
      col("source").as("__nsrc"), lit(1).as("__innew"))
    o.withColumn("__inold", lit(1))
      .join(n, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("__nsrc"), col("__osrc")).as("source"),
        when(col("__inold").isNull, "added")
          .when(col("__innew").isNull, "removed")
          // null-safe: a doc whose text is NULL in both snapshots is
          // unchanged, not changed
          .when(col("__oh") <=> col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }
}
