package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's join surface as reusable combinators (SURVEY §2.3).
  *
  * J1/J2 (shuffle vs broadcast inner) are expressed at call sites via
  * `broadcast()`; J3/J4 (salting/expansion skew joins) are obsolete
  * under AQE (spark.sql.adaptive.skewJoin, default on) — the engine
  * carries no salting code by design (SURVEY §4). What remains worth
  * naming:
  */
object Joins {

  /** J6: keep left rows whose key appears in `keys` (the reference
    * emulated this with a pair join that discards the value). */
  def semi(left: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    left.join(keys, on, "left_semi")

  /** J9: stream/batch anti-join — drop left rows whose key appears in
    * `blacklist` (reference: leftOuterJoin + isPresent filter,
    * AdClickRealTimeStatSpark.java:234-314). */
  def anti(left: DataFrame, blacklist: DataFrame, on: Seq[String]): DataFrame =
    left.join(blacklist, on, "left_anti")

  /** J5: universe ⟕ counts with default 0 (reference chained three
    * leftOuterJoins with Optional-default; one call each here). */
  def leftFillZero(universe: DataFrame, counts: DataFrame, on: Seq[String],
      fillCols: Seq[String]): DataFrame =
    universe.join(counts, on, "left").na.fill(0L, fillCols)
}

/** U1: period-over-period delta via the reference's +1/−1 union trick
  * (UserActiveDegreeAnalyze.scala:92-123). Both periods are scanned
  * once, unioned with a sign column, and one aggregation computes the
  * delta — no self-join, single shuffle on the group key.
  */
object PeriodDelta {

  /** Sum `valueCol` per `key` in period A minus period B.
    * Periods are [start, end) predicates on `ts`. */
  def apply(df: DataFrame, key: String, valueCol: String,
      periodA: Column, periodB: Column): DataFrame = {
    val a = df.filter(periodA).withColumn("sign", lit(1L))
    val b = df.filter(periodB).withColumn("sign", lit(-1L))
    a.unionByName(b)
      .groupBy(col(key))
      .agg(
        // house money convention: per-row floor(x*100) cents, BIGINT
        // sum — bit-identical across engines (no decimal rounding)
        sum(col("sign") * floor(col(valueCol) * lit(100.0)))
          .as("value_delta_cents"),
        sum(col("sign")).as("count_delta"))
  }
}
