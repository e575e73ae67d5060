package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the data-quality report a pipeline publishes
  * next to every table it lands: per column, row/null/distinct
  * counts and min/max. One pass over the table (a single aggregate;
  * the multi-column distinct counts plan as one Expand ×|columns| —
  * the same shape as rollup), then a `stack` unpivot of the 1-row
  * result to the per-column report, which is metadata-grain.
  *
  * `profile` is exact (and oracle-able); `profileApprox` swaps the
  * distinct counts for HLL sketches — the 100 TB default, where an
  * exact distinct per column is an Expand over the whole table and
  * the sketch is one fixed-size buffer per column (see q37).
  *
  * min/max are emitted as strings so the report has one schema for
  * any column set — callers pass integer/string columns (double
  * formatting differs across engines; route doubles through the
  * cents convention first).
  */
object Profile {

  /** The stack() expression splices names into SQL text as 'name'
    * literals and `name__nn` backtick identifiers — only quote and
    * backtick characters actually break it, so reject exactly those
    * (dots, dashes, spaces stay legal, as before the guard). */
  private def checkNames(columns: Seq[String]): Unit = {
    require(columns.nonEmpty, "profile needs at least one column")
    val bad = columns.filter(c => c.contains("'") || c.contains("`"))
    require(bad.isEmpty, s"profile column names cannot contain ' or `: $bad")
  }

  private def unpivot(row: DataFrame, columns: Seq[String]): DataFrame = {
    val stack = columns
      .map(c => s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`")
      .mkString(", ")
    row
      .select(col("__n"), expr(s"stack(${columns.size}, $stack) AS " +
        "(column_name, n_non_null, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    checkNames(columns)
    val aggs = columns.flatMap { c => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx"))
    }
    unpivot(df.agg(count(lit(1)).as("__n"), aggs: _*), columns)
  }

  /** Sketch-based variant: identical report shape, approximate
    * n_distinct (HLL, `rsd` standard error), NO Expand — one pass,
    * one fixed-size buffer per column. */
  def profileApprox(df: DataFrame, columns: Seq[String],
      rsd: Double = 0.02): DataFrame = {
    checkNames(columns)
    val aggs = columns.flatMap { c => Seq(
      count(col(c)).as(s"${c}__nn"),
      approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx"))
    }
    unpivot(df.agg(count(lit(1)).as("__n"), aggs: _*), columns)
  }
}
