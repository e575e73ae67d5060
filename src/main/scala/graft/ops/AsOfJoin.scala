package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-based as-of join: attach to each probe row the LATEST build
  * row with `build.ts <= probe.ts` on the same key (the point-in-time
  * lookup every feature/training pipeline needs: "state of X as of
  * this event").
  *
  * Spark has no asof operator; the naive encodings both fail at scale:
  * a range join (`p.key = b.key AND b.ts <= p.ts` + max-per-row)
  * explodes to |probe| x |timeline| before aggregating, and a
  * per-key `collect_list` sort caps the timeline at executor memory.
  * This implementation is the union+window trick instead: tag build
  * rows side=0 and probe rows side=1, union them, and over a window
  * partitioned by key and ordered by (ts, side, tie) take
  * `last(build_payload, ignoreNulls)` with a rows-unbounded-preceding
  * frame. Build rows sort before probe rows at equal ts, so the match
  * is inclusive (`<=`); the payload travels as ONE struct so all
  * matched columns come from the same build row.
  *
  * Cost: ONE shuffle of |probe| + |build| rows on the key, then a
  * per-partition sort — the same price as the group-by the pipeline
  * would run anyway. No pair blowup at any skew.
  */
object AsOfJoin {

  /** Left as-of join. `probe` and `build` share the key columns
    * `keys` and a timestamp column `tsCol`; every other build column
    * is attached to the probe row as `asof_<name>` (null when the key
    * has no build row at or before the probe ts).
    *
    * `tieBreak` (build column names) makes equal-ts build rows
    * deterministic: the row LAST in ascending (ts, tieBreak) order
    * wins. (ts, tieBreak) must be unique per key.
    */
  def leftAsOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val payload = build.columns.filterNot(keys.contains).toSeq
    require(payload.contains(tsCol), s"build must carry $tsCol")
    val probeCols = probe.columns.filterNot(keys.contains).toSeq
    require(probeCols.contains(tsCol), s"probe must carry $tsCol")

    val bStruct = struct(payload.map(col): _*)
    val pStruct = struct(probeCols.map(col): _*)
    val bType = build.select(bStruct.as("__b")).schema("__b").dataType
    val pType = probe.select(pStruct.as("__p")).schema("__p").dataType

    val bSide = build.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        bStruct.as("__b"), lit(null).cast(pType).as("__p")): _*)
    val pSide = probe.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(bType).as("__b"), pStruct.as("__p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +:
        tieBreak.map(t => col("__b").getField(t).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    bSide.unionByName(pSide)
      .withColumn("__m", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++
        probeCols.map(c => col("__p").getField(c).as(c)) ++
        payload.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }

  /** q43 shape: for every click, the user's most recent purchase at or
    * before the click (left semantics — clicks with no prior purchase
    * keep nulls). Money per the house convention (floor cents). */
  def clickLastPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_event_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    leftAsOf(clicks, purchases, Seq("user_id"), "ts", Seq("event_id"))
      .select(
        col("user_id"), col("click_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_time"),
        col("asof_event_id").as("purchase_event_id"),
        floor(col("asof_value") * lit(100.0)).cast("long").as("purchase_cents"),
        expr("(unix_micros(ts) - unix_micros(asof_ts)) div 1000000")
          .as("secs_since_purchase"))
  }

  /** q44 shape: inner as-of with a tolerance — only clicks whose most
    * recent prior purchase happened within `toleranceSecs`. */
  def clickRecentPurchase(events: DataFrame, toleranceSecs: Long): DataFrame =
    clickLastPurchase(events)
      .filter(col("secs_since_purchase").isNotNull &&
        col("secs_since_purchase") <= toleranceSecs)
}
