package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A2: the session visit/step-length histogram.
  *
  * The reference maintains 16 named counters in a custom string
  * `Accumulator` bumped from inside a filter
  * (SessionAggrStatAccumulator.java:19-93,
  * UserVisitSessionAnalyzeSpark.java:896-952, ratio calc :1259-1322).
  * Spark-first this is a single conditional aggregation — one partial
  * + final hash aggregate, no accumulator, no second pass, and it
  * stays inside whole-stage codegen.
  *
  * Ratios are emitted as integer basis points
  * (floor(10000 * bucket / total)) so the result is bit-exact across
  * engines (a single IEEE double divide + floor — no decimal-rounding
  * ambiguity). The reference's round(x,2) HALF_UP percentages are
  * recoverable as bp/100.
  */
object SessionStats {

  private val visitBuckets: Seq[(String, Long, Long)] = Seq(
    ("visit_1s_3s", 1L, 3L),
    ("visit_4s_6s", 4L, 6L),
    ("visit_7s_9s", 7L, 9L),
    ("visit_10s_30s", 10L, 30L),
    ("visit_30s_60s", 31L, 60L),
    ("visit_1m_3m", 61L, 180L),
    ("visit_3m_10m", 181L, 600L),
    ("visit_10m_30m", 601L, 1800L),
    ("visit_30m_plus", 1801L, Long.MaxValue))

  private val stepBuckets: Seq[(String, Long, Long)] = Seq(
    ("step_1_3", 1L, 3L),
    ("step_4_6", 4L, 6L),
    ("step_7_9", 7L, 9L),
    ("step_10_30", 10L, 30L),
    ("step_30_60", 31L, 60L),
    ("step_60_plus", 61L, Long.MaxValue))

  /** One-row histogram over session aggregates (needs visit_length_s,
    * step_length). Emits session_count, one count per bucket and one
    * `<bucket>_bp` basis-point ratio per bucket. */
  def apply(sessions: DataFrame): DataFrame = {
    val bucketCounts =
      (visitBuckets.map { case (n, lo, hi) => (n, col("visit_length_s"), lo, hi) } ++
        stepBuckets.map { case (n, lo, hi) => (n, col("step_length"), lo, hi) })
        .map { case (n, c, lo, hi) =>
          val cond = if (hi == Long.MaxValue) c >= lo else c.between(lo, hi)
          sum(when(cond, 1L).otherwise(0L)).as(n)
        }
    val counted = sessions.agg(count(lit(1)).as("session_count"), bucketCounts: _*)
    val bpCols = (visitBuckets ++ stepBuckets).map { case (n, _, _) =>
      floor(lit(10000.0) * col(n) / col("session_count")).cast("long").as(s"${n}_bp")
    }
    counted.select(col("session_count") +: (visitBuckets ++ stepBuckets).map(b => col(b._1)) ++: bpCols: _*)
  }

  /** The bucket edges, exposed so the oracle SQL and tests are built
    * from the same single source of truth. */
  def bucketSqlExprs: Seq[String] =
    (visitBuckets.map { case (n, lo, hi) => (n, "visit_length_s", lo, hi) } ++
      stepBuckets.map { case (n, lo, hi) => (n, "step_length", lo, hi) })
      .map { case (n, c, lo, hi) =>
        val cond = if (hi == Long.MaxValue) s"$c >= $lo" else s"$c BETWEEN $lo AND $hi"
        // CAST: DuckDB SUM(int) is HUGEINT; the compare needs int64
        s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $n"
      }

  def bucketNames: Seq[String] = (visitBuckets ++ stepBuckets).map(_._1)
}
