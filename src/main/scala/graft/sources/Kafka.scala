package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — the Kafka stream source (reference: direct DStream over a
  * topic set of ad-click log lines, AdClickRealTimeStatSpark.java:
  * 126-147).
  *
  * Structured Streaming replaces the receiver-less direct API with the
  * built-in `kafka` source: per-partition offsets tracked in the
  * checkpoint, executors pull partition ranges per micro-batch —
  * the same delivery model, zero hand-built machinery.
  *
  * No broker exists in this build/test environment, so this builder is
  * exercised only up to DataFrame construction in tests; the
  * downstream pipeline (graft.streaming.AdClickStream) is
  * source-agnostic — it consumes the one-string-column `value` frame
  * this returns, which MemoryStream provides in tests.
  */
object Kafka {

  /** `readStream.format("kafka")` → one string column `value` (the
    * reference's decoded line). */
  def lines(spark: SparkSession, bootstrapServers: String, topics: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))
}
