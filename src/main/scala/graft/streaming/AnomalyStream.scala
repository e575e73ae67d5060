package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sink.StoreProvider

/** Streaming volume-anomaly monitor — the ingestion-time twin of the
  * q88 batch report ([[graft.ops.Retention.volumeAnomaly]]): flag a
  * day whose event count deviates from its trailing baseline while
  * the day is still filling, not in tomorrow's batch job.
  *
  * Same decision rule as the batch op — (n·x − S)² > k²·(n·Q − S²)
  * over the trailing `windowDays` OBSERVED days, minObs gate — so the
  * spec can assert exact parity against q88 on the same events.
  *
  * Shape: per-(event_type, day) counts are an update-mode stateful
  * aggregation (Spark's checkpointed state carries totals across
  * batches and restarts; the watermark evicts closed days). Each
  * micro-batch publishes ABSOLUTE counts for changed keys via
  * idempotent per-partition puts, then re-flags only the TYPES the
  * batch touched (the TrendStream/T6 touched-group pattern): a late
  * event changes one day's count, and that day sits in the trailing
  * frame of up to `windowDays` later days — so the whole per-type
  * day series is re-scanned. That state is calendar-bounded (a day
  * per type per calendar day — years ≈ hundreds of rows), never
  * stream-length bounded, and the scan runs executor-side.
  *
  * Replay-safe: every write is an absolute put keyed by
  * (event_type, day) — a re-delivered batch overwrites state with
  * the same values, so no ledger or transaction is needed.
  */
object AnomalyStream {

  /** One streamed event (the wire shape the tests drive). */
  final case class Event(event_id: Long, event_type: String,
      ts: java.sql.Timestamp)

  /** Store tables this stream provisions. */
  val Tables: Seq[String] = Seq("daily_count", "volume_anomaly")

  /** Per-(event_type, day) ABSOLUTE running counts for keys changed
    * this batch (update mode). Null timestamps are dropped exactly
    * as in the batch twin. */
  def dailyCounts(events: DataFrame, delay: String = "2 days"): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", delay)
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("cnt"))

  /** The micro-batch body (exposed for tests; calling it twice with
    * the same batch must be a no-op — every write is absolute).
    * Flag arithmetic mirrors the batch op exactly: exact long sums,
    * one double comparison. */
  def anomalyBatch(provider: StoreProvider, windowDays: Int = 7,
      k2: Long = 4L, minObs: Long = 4L)(
      batch: DataFrame, batchId: Long): Unit = {
    require(windowDays >= minObs,
      s"minObs=$minObs can never be met by a $windowDays-row frame")
    batch.persist()
    try {
      AdClickStream.writePerPartition(batch, provider) { (s, r) =>
        s.put("daily_count", Seq(r.getString(0), r.getString(1)), r.getLong(2))
      }
      // re-flag every day of the touched types: a changed day is in
      // the trailing frame of later days, so flags downstream of it
      // may flip; the per-type series is calendar-bounded state
      val touched = batch.select(col("event_type")).distinct()
      AdClickStream.writePerPartition(touched, provider) { (s, r) =>
        val et = r.getString(0)
        val days = s.scanPrefix("daily_count", Seq(et))
          .map { case (key, n) => (key(1), n) }.sortBy(_._1)
        days.indices.foreach { j =>
          val win = days.slice(math.max(0, j - windowDays), j).map(_._2)
          val n = win.length.toLong
          val sSum = win.sum
          val sumSq = win.iterator.map(x => x * x).sum
          val x = days(j)._2
          val dev = n.toDouble * x.toDouble - sSum.toDouble
          val varTerm =
            n.toDouble * sumSq.toDouble - sSum.toDouble * sSum.toDouble
          val flag =
            if (n >= minObs && dev * dev > k2.toDouble * varTerm) 1L else 0L
          s.put("volume_anomaly", Seq(et, days(j)._1), flag)
        }
      }
    } finally batch.unpersist()
  }

  /** The full query: daily counts → idempotent publish + touched-type
    * re-flag. */
  def anomalyQuery(events: DataFrame, provider: StoreProvider,
      checkpointDir: String, windowDays: Int = 7, k2: Long = 4L,
      minObs: Long = 4L, delay: String = "2 days",
      trigger: Trigger = AdClickStream.DefaultTrigger): StreamingQuery =
    dailyCounts(events, delay)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(anomalyBatch(provider, windowDays, k2, minObs) _)
      .start()
}
