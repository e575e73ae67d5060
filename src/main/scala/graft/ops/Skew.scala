package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tools.
  *
  * Join skew and count-like aggregation skew are AQE's job (SURVEY §4
  * — the reference's manual salting patterns J3/J4/A5 are obsolete).
  * The one case AQE does NOT fix is a *set-valued* aggregation
  * (collect_set / collect_list) on a heavy-hitter key: partial
  * aggregation can't shrink the value state, so one reducer holds the
  * whole hot group's set.
  *
  * `saltedDistinctConcat` is the two-phase rewrite of the reference's
  * A6/A7 (`group_concat_distinct`) for that regime. The salt is the
  * VALUE's hash — deterministic (no rand()), and it co-locates equal
  * values, so each salt partition dedups independently and phase 2 is
  * a flatten of disjoint sets, not a re-dedup. Output is identical to
  * `concat_ws(",", array_sort(collect_set(value)))`.
  */
object Skew {

  val DefaultSalts = 16

  /** Phase-1 salt assignment, exposed so tests exercise the product's
    * own salting rather than a copy of the formula. */
  def saltOf(value: Column, salts: Int = DefaultSalts): Column =
    pmod(hash(value), lit(salts))

  def saltedDistinctConcat(df: DataFrame, keys: Seq[String], value: Column,
      outName: String, salts: Int = DefaultSalts): DataFrame = {
    val keyCols = keys.map(col)
    val phase1 = df
      .withColumn("__salt", saltOf(value, salts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(collect_set(value).as("__part"))
    phase1
      .groupBy(keyCols: _*)
      .agg(concat_ws(",",
        array_sort(flatten(collect_list(col("__part"))))).as(outName))
  }
}
