package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM interval join: live click-to-impression attribution
  * — the canonical two-stream case (AdClickRealTimeStatSpark's module
  * joins clicks against static state; production attribution joins
  * two LIVE streams: an impression is creditable only for clicks
  * inside its attribution window).
  *
  * Semantics: click c attributes to impression i of the SAME ad iff
  * `i.ts <= c.ts <= i.ts + windowSeconds`. Inner join — an
  * unattributed click is absence, matching the batch twin
  * (`RangeJoin`'s trailing-window contract, q51's family, with the
  * roles: impressions = build side, clicks = probe side).
  *
  * Scale shape: BOTH sides carry watermarks, so Spark bounds the
  * join state to the window + watermark slack and evicts buffered
  * impressions the moment no future click could land in their
  * window — without the time-range conjunct in the join condition
  * the state would grow forever (the classic stream-stream join
  * failure). The equi-key (ad_id) keeps it a hash join on the
  * shuffle key; the range conjunct prunes within the key group.
  */
object ClickJoinStream {

  /** `imps`: (ad_id, impression_id, ts); `clicks`: (ad_id, click_id,
    * ts); both streaming frames. Output: one row per attributed
    * click, append mode. */
  def attributedClicks(imps: DataFrame, clicks: DataFrame,
      windowSeconds: Long = 600L,
      watermark: String = "10 minutes"): DataFrame = {
    val i = imps.withWatermark("ts", watermark)
      .select(col("ad_id"), col("impression_id"), col("ts").as("imp_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("ad_id").as("c_ad_id"), col("click_id"),
        col("ts").as("click_ts"))
    i.join(c,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"interval $windowSeconds seconds"))
      .select(col("ad_id"), col("impression_id"), col("click_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** The OUTER variant: every impression, attributed or not — the
    * "wasted spend" stream. Stream-stream LEFT OUTER is the harder
    * semantics: an unmatched impression can only emit once NO future
    * click could still match it, i.e. after the watermark passes the
    * end of its attribution window — Spark holds it in join state
    * until then and emits the null-extended row on eviction. (The
    * inner join never waits; the OUTER rows are late by one
    * watermark advance BY DESIGN — a spec-pinned behavior, not a
    * bug.) */
  def attributionOutcome(imps: DataFrame, clicks: DataFrame,
      windowSeconds: Long = 600L,
      watermark: String = "10 minutes"): DataFrame = {
    val i = imps.withWatermark("ts", watermark)
      .select(col("ad_id"), col("impression_id"), col("ts").as("imp_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("ad_id").as("c_ad_id"), col("click_id"),
        col("ts").as("click_ts"))
    i.join(c,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"interval $windowSeconds seconds"),
      "left_outer")
      .select(col("ad_id"), col("impression_id"), col("imp_ts"),
        col("click_id"), col("click_ts"),
        col("click_id").isNotNull.cast("int").as("attributed"))
  }

  /** The batch twin on static frames — same columns, same predicate
    * (the parity spec runs both on one event split). */
  def attributedClicksBatch(imps: DataFrame, clicks: DataFrame,
      windowSeconds: Long = 600L): DataFrame = {
    val i = imps.select(col("ad_id"), col("impression_id"),
      col("ts").as("imp_ts"))
    val c = clicks.select(col("ad_id").as("c_ad_id"), col("click_id"),
      col("ts").as("click_ts"))
    i.join(c,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"interval $windowSeconds seconds"))
      .select(col("ad_id"), col("impression_id"), col("click_id"),
        col("imp_ts"), col("click_ts"))
  }
}
