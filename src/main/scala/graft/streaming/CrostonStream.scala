package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Croston forecaster — the live twin of the q318 batch op
  * (`graft.ops.Market.crostonDemand`): per part the machine keeps the
  * last W+1 demand DAYS as a bounded ring and re-emits the
  * size/interval dyadic smoothing after every batch, so the
  * units/day forecast for a slow-moving SKU moves the moment its
  * next demand lands instead of at the nightly rebuild.
  *
  * Why the ring is W+1 (not W): the last W occurrences each need the
  * gap to their PREDECESSOR; with W+1 retained days, every needed gap
  * is inside the ring — the oldest entry serves only as the first
  * gap's anchor and never contributes its own size/gap. Same-day
  * lines FOLD into their day's entry (exactly the batch (part, day)
  * pre-aggregation), so any split of a day's lines across batches
  * reproduces the batch numbers bit-for-bit. State per part: ≤W+1
  * (day, units) pairs + a lifetime day counter — bounded regardless
  * of volume.
  *
  * Ordering contract (the ScdStream rule): an arrival older than the
  * ring's oldest retained day is skipped — it could only rewrite
  * forecasts already emitted; batch q318 owns exact late-data
  * semantics on replay. Arrivals anywhere INSIDE the ring's span
  * (including out-of-order new days) are folded exactly.
  *
  * Emission: one row per touched part per batch with the current
  * ×(2^W−1)-scaled sums and the exact forecast ratio — a monitor
  * log whose LATEST row per part equals the batch op on the same
  * data (the parity the spec pins).
  */
object CrostonStream {

  /** Wire shape: one demand observation (already line-grain). */
  final case class Demand(partkey: Long, daynum: Long, units: Long)

  /** Ring of the last ≤W+1 demand days (ascending) + lifetime days. */
  final case class Ring(days: Seq[Long], units: Seq[Long], n: Long)

  /** One emitted forecast row (scaled sums are the batch op's). */
  final case class Forecast(partkey: Long, n_demands: Long, zw: Long,
      xw: Long, croston_milli: Option[Long])

  /** zw/xw/forecast from a ring — the batch kernel verbatim. */
  def forecastOf(partkey: Long, ring: Ring, w: Int): Forecast = {
    val m = ring.days.size
    var zw = 0L; var xw = 0L
    (0 until m).foreach { i =>
      val lag = (m - 1) - i
      if (lag < w) {
        val sh = 1L << (w - 1 - lag)
        zw += ring.units(i) * sh
        if (i >= 1) xw += (ring.days(i) - ring.days(i - 1)) * sh
      }
    }
    Forecast(partkey, ring.n, zw, xw,
      if (xw > 0L) Some(1000L * zw / xw) else None)
  }

  /** The state-transition function (exposed for unit tests): fold the
    * batch's demand lines into the ring, emit the refreshed row. */
  def updatePart(w: Int)(partkey: Long, demands: Iterator[Demand],
      state: GroupState[Ring]): Iterator[Forecast] = {
    var ring = state.getOption.getOrElse(Ring(Vector.empty, Vector.empty, 0L))
    demands.toSeq.sortBy(d => d.daynum).foreach { d =>
      if (ring.days.isEmpty || d.daynum >= ring.days.head) {
        val idx = ring.days.indexWhere(_ == d.daynum)
        ring =
          if (idx >= 0)
            ring.copy(units = ring.units.updated(idx, ring.units(idx) + d.units))
          else {
            val pos = ring.days.indexWhere(_ > d.daynum) match {
              case -1 => ring.days.size
              case p => p
            }
            val grown = Ring(
              (ring.days.take(pos) :+ d.daynum) ++ ring.days.drop(pos),
              (ring.units.take(pos) :+ d.units) ++ ring.units.drop(pos),
              ring.n + 1L)
            val over = grown.days.size - (w + 1)
            if (over > 0)
              Ring(grown.days.drop(over), grown.units.drop(over), grown.n)
            else grown
          }
      } // else: straggler behind the ring — skip (contract above)
    }
    if (ring.n > 0L) {
      state.update(ring)
      Iterator.single(forecastOf(partkey, ring, w))
    } else Iterator.empty
  }

  /** Wire onto a streaming lineitem-shaped frame (l_partkey,
    * l_shipdate ts, l_quantity). Emits the per-batch forecast log. */
  def forecasts(lines: DataFrame, windowPow: Int = 8,
      watermark: String = "10 minutes"): Dataset[Forecast] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .withWatermark("l_shipdate", watermark)
      .select(col("l_partkey").as("partkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("daynum"),
        col("l_quantity").cast("long").as("units"))
      .as[Demand]
      .groupByKey(_.partkey)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updatePart(windowPow))
  }
}
