package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based exact quantiles and multi-level aggregates — capability
  * extensions beyond the reference (which has no percentile, rollup,
  * or approx-distinct anywhere; SURVEY §2.4), shaped for scale.
  *
  * Median is computed rank-based (row_number vs count over the group
  * window) rather than via `percentile`, for two reasons: the
  * arithmetic is integer-exact and engine-portable (hash-checkable
  * against DuckDB — interpolating percentile implementations differ in
  * final-ulp float details), and the plan is one shuffle on the group
  * key.
  */
object Percentiles {

  /** Exact per-group median of `valueCol` in integer cents, via a
    * VALUE HISTOGRAM: aggregate to (group, value, count) first —
    * partial aggregation map-side, no skew — then find the middle
    * ranks on the tiny histogram frame with a cumulative window.
    *
    * The naive formulation (row_number over each group) funnels every
    * row of a group through one reducer — a few groups × 100 TB is a
    * single-machine sort. The histogram plan's window runs over
    * |distinct values| rows per group, so it scales whenever the value
    * domain is bounded (measures, prices, quantities); for genuinely
    * continuous columns use approx percentile sketches instead. */
  /** The shared scaffold: (group, value, cnt) histogram with
    * cumulative and total counts — both quantile entry points build
    * on this one frame. */
  private def cumHistogram(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    // NULL convention, pinned on BOTH engines: NULL values are
    // excluded from the histogram AND from the rank denominator n. A
    // NULL can never be selected as a quantile value, so counting it
    // in n would shift every reported quantile toward smaller values;
    // worse, Spark's window ORDER BY sorts NULLS FIRST while DuckDB's
    // sorts NULLS LAST, so an unfiltered NULL silently breaks
    // cross-engine parity. The oracle twins carry the matching
    // WHERE <value> IS NOT NULL.
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy(col(groupCol))
    hist
      .withColumn("cum", sum(col("cnt")).over(wg.orderBy(col(valueCol).asc)))
      .withColumn("n", sum(col("cnt")).over(wg))
  }

  def medianCents(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cum = cumHistogram(df, groupCol, valueCol)
    // the two middle ranks (equal when n is odd); the value holding
    // rank m is the least value whose cumulative count reaches m
    def valueAtRank(rank: Column): Column =
      min(when(col("cum") >= rank, col(valueCol))).cast("double")
    cum.groupBy(col(groupCol))
      .agg(
        floor((valueAtRank(expr("(n + 1) div 2")) +
          valueAtRank(expr("(n + 2) div 2"))) / 2 * 100).cast("long")
          .as("median_cents"),
        min(col("n")).as("n_rows"))
  }

  /** Exact per-group quantile at `pBp` basis points (lower/"inverted
    * CDF" definition: the least value whose cumulative count reaches
    * ceil(p·n)) — the same value-histogram plan as `medianCents`, so
    * the window runs over distinct values, never rows. p95 is the
    * latency/size-budget workhorse (e.g. sequence-length budgeting
    * for packing). */
  def quantileCents(df: DataFrame, groupCol: String, valueCol: String,
      pBp: Long = 9500L): DataFrame = {
    require(pBp >= 1L && pBp <= 10000L, "pBp must be in [1, 10000]")
    cumHistogram(df, groupCol, valueCol).groupBy(col(groupCol))
      .agg(
        floor(min(when(col("cum") >= expr(s"(n * $pBp + 9999) div 10000"),
          col(valueCol))).cast("double") * 100).cast("long")
          .as("quantile_cents"),
        min(col("n")).as("n_rows"))
  }

  /** Multi-RANK quantile table (p50/p90/p99-style latency panel) from
    * ONE histogram pass: every rank reads the same per-group
    * cumulative value histogram, so adding a percentile costs one
    * conditional aggregate, not a scan. Output one row per
    * (group, rank_bp) — the long/tidy shape dashboards join against.
    *
    * Scale shape: exactly [[quantileCents]]'s plan (value-grain
    * window, never rows) with the rank list unrolled as aggregate
    * columns and unpivoted via a bounded explode. */
  def quantileTable(df: DataFrame, groupCol: String, valueCol: String,
      ranksBp: Seq[Long] = Seq(5000L, 9000L, 9900L)): DataFrame = {
    require(ranksBp.nonEmpty && ranksBp.forall(p => p >= 1L && p <= 10000L),
      "ranks must be in [1, 10000] bp")
    // duplicate ranks would generate duplicate __q<p> aggregate
    // aliases in one agg() — an opaque AnalysisException at planning
    // time; fail with a clear message instead
    require(ranksBp.distinct.size == ranksBp.size,
      s"ranks must be distinct: $ranksBp")
    val cum = cumHistogram(df, groupCol, valueCol)
    val aggs = ranksBp.map { p =>
      floor(min(when(col("cum") >= expr(s"(n * $p + 9999) div 10000"),
        col(valueCol))).cast("double") * 100).cast("long").as(s"__q$p")
    }
    cum.groupBy(col(groupCol))
      .agg(min(col("n")).as("n_rows"), aggs: _*)
      .select(col(groupCol), col("n_rows"), explode(array(ranksBp.map { p =>
        struct(lit(p).as("rank_bp"), col(s"__q$p").as("value_cents"))
      }: _*)).as("q"))
      .select(col(groupCol), col("q.rank_bp").as("rank_bp"),
        col("q.value_cents").as("value_cents"), col("n_rows"))
  }

  /** Log-band quantile SKETCH next to its exact answer — the
    * mergeable swap for [[quantileTable]] when the value domain is
    * genuinely unbounded (the one regime the scaladoc above sends to
    * sketches): per (group, bit-length band) counts are the whole
    * summary — ≤64 rows per group, cell-wise addable across
    * executors/days exactly like the q281 HLL partials — and the
    * quantile answer is the band holding the target rank, i.e. a
    * GUARANTEED-width interval [2^(b−1), 2^b−1] (relative width ≤ 2×)
    * rather than a point. The verdict columns make the trade
    * auditable: `within` (the exact nearest-rank value lands in the
    * sketch's band — structural: both walks use the same rank rule
    * over the same mass, so a 0 here is a bug, not noise) and
    * `rel_width_bp` (what 2× relative error means at this quantile,
    * in bp of the band floor).
    *
    * Columns: group, rank_bp, n_rows, exact_cents, sk_band,
    * sk_lo_cents, sk_hi_cents, within, rel_width_bp.
    *
    * Scale shape: ONE fact pass to the (group, cents) histogram
    * (persisted — the exact walk and the band walk are two readers;
    * caller-owns-cache convention); the band walk then runs over ≤64
    * rows per group. At 100 TB you'd ship ONLY the band counts and
    * skip the exact twin — the twin exists to grade the sketch. */
  def sketchQuantileTable(df: DataFrame, groupCol: String, valueCol: String,
      ranksBp: Seq[Long] = Seq(5000L, 9000L, 9900L)): DataFrame = {
    require(ranksBp.nonEmpty && ranksBp.forall(p => p >= 1L && p <= 10000L)
      && ranksBp.distinct.size == ranksBp.size, "ranks distinct, in [1,10000]")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol),
        floor(col(valueCol) * lit(100.0)).cast("long").as("cents"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val wg = Window.partitionBy(col(groupCol))
    def rankOf(p: Long) = expr(s"(n * $p + 9999) div 10000")
    val exact = hist
      .withColumn("cum", sum(col("cnt")).over(wg.orderBy(col("cents").asc)))
      .withColumn("n", sum(col("cnt")).over(wg))
    val exactQ = exact.groupBy(col(groupCol))
      .agg(min(col("n")).as("n_rows"), ranksBp.map { p =>
        min(when(col("cum") >= rankOf(p), col("cents"))).as(s"__e$p")
      }: _*)
    val bands = hist
      .withColumn("band", when(col("cents") <= 0L, lit(0))
        .otherwise(length(bin(col("cents")))).cast("int"))
      .groupBy(col(groupCol), col("band"))
      .agg(sum(col("cnt")).as("bcnt"))
      .withColumn("cumb", sum(col("bcnt")).over(wg.orderBy(col("band").asc)))
      .withColumn("n", sum(col("bcnt")).over(wg))
    val bAggs = ranksBp.map { p =>
      min(when(col("cumb") >= rankOf(p), col("band"))).as(s"__b$p")
    }
    val bandQ = bands.groupBy(col(groupCol)).agg(bAggs.head, bAggs.tail: _*)
    exactQ.join(bandQ, Seq(groupCol))
      .select(col(groupCol), col("n_rows"),
        explode(array(ranksBp.map { p =>
          struct(lit(p).as("rank_bp"), col(s"__e$p").as("exact_cents"),
            col(s"__b$p").as("sk_band"))
        }: _*)).as("q"))
      .select(col(groupCol), col("q.rank_bp").as("rank_bp"), col("n_rows"),
        col("q.exact_cents").as("exact_cents"),
        col("q.sk_band").as("sk_band"))
      .withColumn("sk_lo_cents", when(col("sk_band") === 0, 0L)
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), sk_band - 1)")))
      .withColumn("sk_hi_cents", when(col("sk_band") === 0, 0L)
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), sk_band) - 1")))
      .withColumn("within",
        (col("exact_cents") >= col("sk_lo_cents") &&
          col("exact_cents") <= col("sk_hi_cents")).cast("int"))
      .withColumn("rel_width_bp", expr(
        "((sk_hi_cents - sk_lo_cents) * 10000) DIV greatest(sk_lo_cents, 1)"))
      .orderBy(col(groupCol).asc, col("rank_bp").asc)
  }

  /** WEIGHTED exact nearest-rank quantiles: rank positions measured
    * in weight mass, not rows — "the price below which half the
    * UNITS ship" needs quantity weighting, and a row-ranked quantile
    * answers a different question. Same value-grain cumulative-
    * histogram shape as [[quantileTable]] (the window never runs
    * over raw rows), with the crossing at ceil(rank·W/10000) of the
    * group's total weight; weights floor to BIGINT so the crossing
    * arithmetic is exact in both engines. Zero-total-weight groups
    * report null values. */
  def weightedQuantileTable(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String,
      ranksBp: Seq[Long] = Seq(5000L, 9000L, 9900L)): DataFrame = {
    require(ranksBp.nonEmpty && ranksBp.forall(p => p >= 1L && p <= 10000L),
      "ranks must be in [1, 10000] bp")
    require(ranksBp.distinct.size == ranksBp.size,
      s"ranks must be distinct: $ranksBp")
    val hist = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(col(groupCol), col(valueCol),
        floor(col(weightCol)).cast("long").as("__w"))
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col("__w")).as("__w"))
      .withColumn("cum", sum(col("__w")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc)))
      .withColumn("tw", sum(col("__w")).over(
        Window.partitionBy(col(groupCol))))
    val aggs = ranksBp.map { p =>
      floor(min(when(col("cum") >= expr(s"(tw * $p + 9999) div 10000") &&
        col("tw") > 0L, col(valueCol))).cast("double") * 100).cast("long")
        .as(s"__q$p")
    }
    hist.groupBy(col(groupCol))
      .agg(min(col("tw")).as("total_weight"), aggs: _*)
      .select(col(groupCol), col("total_weight"),
        explode(array(ranksBp.map { p =>
          struct(lit(p).as("rank_bp"), col(s"__q$p").as("value_cents"))
        }: _*)).as("q"))
      .select(col(groupCol), col("q.rank_bp").as("rank_bp"),
        col("q.value_cents").as("value_cents"), col("total_weight"))
  }

  /** Ungrouped exact nearest-rank quantiles of `valueCol`, as ONE row
    * of `__q<p>` columns over the value-grain cumulative histogram
    * (NULLs excluded — the shared convention above). The building
    * block `Experiment.winsorizedLift` (pooled cap) and
    * `Integrity.timeToConvert` (delay panel) rank from, so the rank
    * arithmetic and its guards live in exactly one place. */
  def valueQuantiles(df: DataFrame, valueCol: String,
      ranksBp: Seq[Long]): DataFrame = {
    require(ranksBp.nonEmpty && ranksBp.forall(p => p >= 1L && p <= 10000L),
      "ranks must be in [1, 10000] bp")
    require(ranksBp.distinct.size == ranksBp.size,
      s"ranks must be distinct: $ranksBp")
    val hist = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy().orderBy(col(valueCol).asc)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
    val picks = ranksBp.map { p =>
      min(when(col("cum") >= expr(s"(n * $p + 9999) div 10000"),
        col(valueCol))).as(s"__q$p")
    }
    hist.agg(picks.head, picks.tail: _*)
  }

  /** Exact equi-DEPTH histogram: `nBins` bins of (as near as ties
    * allow) equal row count over an integer value column — the
    * profiling complement of the fixed-width q110 histogram, and what
    * tie-heavy columns actually need: a value whose rank interval
    * crosses a boundary lands whole in the bin of its LAST rank, so
    * heavy ties produce visibly fat (and possibly missing) bins
    * instead of a silently lying "uniform" picture. bin(v) =
    * (cum(v)−1)·nBins div n + 1 — all-integer, engine-exact.
    *
    * Same scale shape as [[valueQuantiles]]: one value-grain
    * aggregate, a cumulative window over DISTINCT values (never
    * rows), then a ≤nBins-row report. NULLs excluded like every
    * quantile op (same cross-engine reason). Columns: bin, n_rows,
    * lo, hi; bins with no final rank are absent by construction. */
  def equiDepthBins(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy().orderBy(col(valueCol).asc)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("bin", expr(s"(cum - 1L) * ${nBins}L div n + 1L"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy(col("bin").asc)
  }

  /** Multi-level totals via ROLLUP — per (a,b), per a, and grand
    * total in ONE pass (partial aggregation covers all levels;
    * grouping_id disambiguates). */
  def rollupTotals(df: DataFrame, a: String, b: String, valueCol: String): DataFrame =
    df.rollup(col(a), col(b))
      .agg(count(lit(1)).as("n_rows"),
        // house money convention (see Sessionize): floor(x*100) cents
        // summed as BIGINT — cross-engine bit-exact, and a long
        // aggregation buffer through Expand instead of decimal128
        sum(floor(col(valueCol) * lit(100.0))).as("total_cents"))
      .select(
        coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("n_rows"), col("total_cents"))

  /** CUBE totals — rollup's lattice completion (adds the (∅,b)
    * cross-slices rollup omits). Same single Expand+HashAggregate
    * plan shape and the same integer-cents convention as
    * `rollupTotals`; the Expand factor is 4 grouping sets instead of
    * 3, still one shuffle, partial-aggregated map-side. */
  def cubeTotals(df: DataFrame, a: String, b: String, valueCol: String): DataFrame =
    df.cube(col(a), col(b))
      .agg(count(lit(1)).as("n_rows"),
        sum(floor(col(valueCol) * lit(100.0))).as("total_cents"))
      .select(
        coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("n_rows"), col("total_cents"))

  /** GROUPING SETS margins — the family member rollup and cube
    * can't express: both one-dimensional margins PLUS the grand
    * total, WITHOUT the (a, b) cross product (the dashboard-margin
    * query; on a high-cardinality pair the cross slice is exactly
    * the part you don't want to compute). Explicit grouping flags
    * (g_a, g_b) disambiguate subtotal rows from genuine NULL keys —
    * the discriminator the coalesce-'ALL' convention alone lacks.
    * Same single Expand + one-shuffle plan and integer-cents
    * convention as [[rollupTotals]]/[[cubeTotals]]. */
  def groupingSetsTotals(df: DataFrame, a: String, b: String,
      valueCol: String): DataFrame = {
    // the () set is a SEPARATE ungrouped aggregate on purpose: SQL's
    // GROUPING SETS (()) emits a grand-total row even on an EMPTY
    // table (DuckDB does), while Spark's Dataset.groupingSets treats
    // every set as grouped and emits nothing — an ungrouped agg has
    // the SQL semantics natively (EdgeCasesSpec pins the convergence)
    val margins = df.groupingSets(Seq(Seq(col(a)), Seq(col(b))),
        col(a), col(b))
      .agg(grouping(col(a)).cast("long").as("g_a"),
        grouping(col(b)).cast("long").as("g_b"),
        count(lit(1)).as("n_rows"),
        sum(floor(col(valueCol) * lit(100.0))).as("total_cents"))
      .select(
        coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("g_a"), col("g_b"), col("n_rows"), col("total_cents"))
    val grand = df
      .agg(count(lit(1)).as("n_rows"),
        sum(floor(col(valueCol) * lit(100.0))).as("total_cents"))
      .select(lit("ALL").as(a), lit("ALL").as(b),
        lit(1L).as("g_a"), lit(1L).as("g_b"),
        col("n_rows"), col("total_cents"))
    margins.unionAll(grand)
      .orderBy(col("g_a").asc, col("g_b").asc, col(a).asc, col(b).asc)
  }

  /** Approximate per-group median in cents via a mergeable quantile
    * sketch (`percentile_approx`) — the scale path for genuinely
    * CONTINUOUS value domains, where the exact histogram plan above
    * degenerates (|distinct values| → |rows|). Fixed-size sketch per
    * group, partial-merged map-side; the shuffle carries sketches,
    * never values. Same output grain/units as medianCents so the two
    * are drop-in alternatives. */
  def approxMedianCents(df: DataFrame, groupCol: String, valueCol: String,
      accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        floor(percentile_approx(col(valueCol), lit(0.5), lit(accuracy)) * 100)
          .cast("long").as("approx_median_cents"),
        count(lit(1)).as("n_rows"))

  /** HyperLogLog++ approximate distinct — the count-distinct that
    * scales (fixed-size sketch per group, mergeable map-side; exact
    * distinct shuffles every value). rsd 1.5% ≈ 12KB sketches. */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.015): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  // ---- driver-checkable sketch verification frames ----
  //
  // Sketch estimates are engine-specific (HLL/KLL internals differ per
  // implementation), so the raw ops above can never hash-match a
  // cross-engine oracle. These twins make the sketches first-class in
  // the correctness gate anyway: compute the EXACT answer alongside
  // the sketch and emit (exact, sketch_ok) where sketch_ok is the
  // sketch's bounded-error verdict. The output is deterministic — an
  // oracle emits the exact value and literal TRUE — and the sketch
  // still participates: if it ever drifts out of bound, sketch_ok
  // flips to 0 and the row hash-mismatches. The exact side is
  // gate-shaped (count-distinct shuffles values; fine at verification
  // scale) — production code uses the sketch ops above alone.

  /** q37 twin: exact distinct + HLL-within-`maxErrBp` verdict. Both
    * aggregates run over a pre-deduped (group, value) frame: HLL
    * insertion is idempotent so the estimate is unchanged, the exact
    * count becomes a plain count, and the plan avoids the Expand
    * (2× row duplication) a mixed distinct/non-distinct aggregate
    * would otherwise pay — the dedup shuffle carries only distinct
    * pairs after map-side partial aggregation (~4× faster at sf0.1). */
  def approxDistinctChecked(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.015, maxErrBp: Long = 500L): DataFrame =
    df.select(col(groupCol), col(valueCol)).distinct()
      .groupBy(col(groupCol))
      .agg(
        // count(valueCol), not count(1): COUNT(DISTINCT x) ignores
        // NULLs but keeps the group — the deduped frame carries at
        // most one (group, NULL) row, which must not be counted
        count(col(valueCol)).as("exact_distinct"),
        approx_count_distinct(col(valueCol), rsd).as("sketch"))
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("sketch") - col("exact_distinct")) * lit(10000L) <=
          col("exact_distinct") * lit(maxErrBp)).cast("int").as("sketch_ok"))

  /** q38 twin: exact histogram median + KLL-within-`maxErrCents`
    * verdict (sketch quantile definitions differ from the rank
    * midpoint by at most one value step on a discrete domain). */
  def approxMedianChecked(df: DataFrame, groupCol: String, valueCol: String,
      accuracy: Int = 10000, maxErrCents: Long = 100L): DataFrame =
    medianCents(df, groupCol, valueCol)
      .join(approxMedianCents(df, groupCol, valueCol, accuracy)
        .withColumnRenamed("n_rows", "n_rows_a"), Seq(groupCol))
      .select(col(groupCol), col("median_cents"), col("n_rows"),
        (abs(col("approx_median_cents") - col("median_cents")) <=
          lit(maxErrCents)).cast("int").as("sketch_ok"))
}
