package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Join-key skew report — the diagnostic run BEFORE a big join or
    * aggregation ships: the k hottest values of `key` with their row
    * counts, each key's corpus share, and its ratio to the MEAN key
    * frequency (`hot_x_mean`, in basis points of the mean — a key at
    * 50× mean is the straggler task AQE's skew-join will have to
    * split; two of them decide your salt factor). Nulls are a key
    * like any other: a 40%-null join key is the most common skew bug.
    *
    * Scale shape: one partial-aggregated shuffle to key grain; the
    * global mean (distinct keys + total rows) is a second aggregate
    * OVER THE KEY-GRAIN frame (persisted, so the corpus is scanned
    * once), broadcast as one row; top-k is TakeOrderedAndProject. */
  def keySkew(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val byKey = df
      .groupBy(col(key).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = byKey.agg(
      count(lit(1)).as("n_keys"), sum(col("n_rows")).as("total_rows"))
    byKey.crossJoin(broadcast(totals))
      .withColumn("share_bp",
        floor(lit(10000.0) * col("n_rows") / col("total_rows")).cast("long"))
      // n_rows / (total/keys) reassociated into DOUBLE space before
      // the n_keys multiply: the integer cross-product n_rows*n_keys
      // overflows BIGINT at the 100 TB design point (1e9-row hot key
      // × 1e9 distinct keys), where Spark wraps silently and DuckDB
      // raises — left-to-right 10000.0*n_rows/total*n_keys is the
      // same IEEE op sequence on both engines, mirrored in q137's SQL
      .withColumn("hot_x_mean_bp",
        floor(lit(10000.0) * col("n_rows") / col("total_rows") *
          col("n_keys")).cast("long"))
      .orderBy(col("n_rows").desc, col("key_value").asc_nulls_first)
      .limit(k)
      .select(col("key_value"), col("n_rows"), col("n_keys"),
        col("total_rows"), col("share_bp"), col("hot_x_mean_bp"))
  }

  /** Semi-structured schema profile of a JSON column — the
    * "what keys actually live in this props blob" report every
    * event-pipeline onboarding starts with (the schema is whatever
    * producers ship, and drift lands here first). Per discovered key:
    * presence count and share, distinct-value count, min/max value
    * (values as strings — the only cross-producer-safe type).
    *
    * Scale shape: ONE scan of the corpus — each row explodes to its
    * parsed (key, value) entries PLUS one sentinel entry, so the
    * grand row total (NULL/garbage props included, matching the
    * oracle's bare COUNT(*)) rides the same key-grain aggregate as a
    * sentinel group instead of a second input scan. The total is then
    * spread over the key-grain frame (bounded by the real key
    * vocabulary, i.e. metadata-sized) with a global window — one
    * single-partition exchange of key-grain rows, never of the
    * corpus. PlanAuditSpec pins the single source scan. */
  /** The exploded (sentinel ∪ parsed-entry) stream both schema
    * profiles aggregate: one row per (input row) sentinel + one per
    * parsed (key, value) entry. */
  private def propsEntries(df: DataFrame, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    val sentinel = struct(lit(true).as("s"),
      lit(null).cast("string").as("key"),
      lit(null).cast("string").as("value"))
    // coalesce to the empty map: map_entries(NULL) is NULL and would
    // null out the whole concat, dropping the row from the total
    val entries = transform(
      map_entries(coalesce(parsed, map())),
      e => struct(lit(false).as("s"),
        e.getField("key").as("key"), e.getField("value").as("value")))
    df.select(explode(concat(array(sentinel), entries)).as("e"))
      .select(col("e.s").as("s"), col("e.key").as("key"),
        col("e.value").as("value"))
  }

  /** Spread the sentinel group's count over the key grain and emit
    * the report columns. */
  private def propsReport(grain: DataFrame,
      extra: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val total = max(when(col("s"), col("n_present")))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    grain
      .withColumn("total_rows", total)
      .filter(!col("s"))
      .withColumn("present_bp",
        floor(lit(10000.0) * col("n_present") / col("total_rows"))
          .cast("long"))
      .select(Seq(col("key"), col("n_present"), col("n_values"),
        col("min_value"), col("max_value"), col("present_bp")) ++ extra: _*)
  }

  def propsSchema(df: DataFrame, jsonCol: String = "props"): DataFrame =
    propsReport(
      propsEntries(df, jsonCol)
        .groupBy(col("s"), col("key"))
        .agg(count(lit(1)).as("n_present"),
          count_distinct(col("value")).as("n_values"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value")),
      Seq.empty)

  /** Sketch-based schema profile — the 100 TB default: identical
    * report shape with approximate n_values (HLL, `rsd` standard
    * error). The exact variant's distinct count is a two-level
    * aggregate whose first level runs at (key, value) grain — for a
    * high-cardinality value domain that is nearly a corpus-sized
    * shuffle; the sketch is ONE aggregate level with a fixed-size
    * buffer per key, merged map-side. */
  def propsSchemaApprox(df: DataFrame, jsonCol: String = "props",
      rsd: Double = 0.02): DataFrame =
    propsReport(
      propsEntries(df, jsonCol)
        .groupBy(col("s"), col("key"))
        .agg(count(lit(1)).as("n_present"),
          approx_count_distinct(col("value"), rsd).as("n_values"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value")),
      Seq.empty)

  /** q150 twin (the q37 exact-twin + bounded-verdict pattern): the
    * exact report plus a `sketch_ok` verdict that the HLL estimate is
    * within `maxErrBp` of the exact count per key. The oracle emits
    * the exact values and literal 1, so a sketch drifting out of
    * bound hash-mismatches — the sketch is first-class in the
    * correctness gate while production uses [[propsSchemaApprox]]
    * alone. */
  def propsSchemaApproxChecked(df: DataFrame, jsonCol: String = "props",
      rsd: Double = 0.02, maxErrBp: Long = 500L): DataFrame =
    propsReport(
      propsEntries(df, jsonCol)
        .groupBy(col("s"), col("key"))
        .agg(count(lit(1)).as("n_present"),
          count_distinct(col("value")).as("n_values"),
          approx_count_distinct(col("value"), rsd).as("__sketch"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value")),
      Seq((abs(col("__sketch") - col("n_values")) * lit(10000L) <=
        col("n_values") * lit(maxErrBp)).cast("int").as("sketch_ok")))

  /** Snapshot profile drift — q109's value-drift cousin at the SCHEMA
    * level: for each column, null-rate and distinct-cardinality
    * movement between the rows before and after `splitDate` (the
    * "did a producer change what it ships" gate; a null-rate jump or
    * a distinct-count collapse is how a silently-broken upstream
    * field first shows up). Both snapshots aggregate in ONE pass via
    * conditional aggregates — never two scans — then unpivot to the
    * per-column report (metadata grain).
    *
    * Deltas are integer bp; the distinct ratio is floored bp of
    * post/pre (0 when the pre snapshot never saw the column). */
  def profileDrift(df: DataFrame, tsCol: String, splitDate: String,
      columns: Seq[String]): DataFrame = {
    checkNames(columns)
    val pre = col(tsCol) < to_timestamp(lit(splitDate))
    val post = col(tsCol) >= to_timestamp(lit(splitDate))
    val aggs = columns.flatMap { c => Seq(
      count(when(pre, col(c))).as(s"${c}__nnpre"),
      count(when(post, col(c))).as(s"${c}__nnpost"),
      count_distinct(when(pre, col(c))).as(s"${c}__ndpre"),
      count_distinct(when(post, col(c))).as(s"${c}__ndpost"))
    }
    val row = df
      .filter(col(tsCol).isNotNull)
      .agg(count(when(pre, lit(1))).as("__npre"),
        (count(when(post, lit(1))).as("__npost") +: aggs): _*)
    val stack = columns
      .map(c => s"'$c', `${c}__nnpre`, `${c}__nnpost`, `${c}__ndpre`, `${c}__ndpost`")
      .mkString(", ")
    val bpNull = (nn: Column, n: Column) =>
      when(n === 0L, lit(0L))
        .otherwise(floor(lit(10000.0) * (n - nn) / n).cast("long"))
    row
      .select(col("__npre"), col("__npost"),
        expr(s"stack(${columns.size}, $stack) AS " +
          "(column_name, nn_pre, nn_post, nd_pre, nd_post)"))
      .select(col("column_name"),
        col("__npre").as("n_pre"), col("__npost").as("n_post"),
        col("nn_pre"), col("nn_post"), col("nd_pre"), col("nd_post"),
        (bpNull(col("nn_post"), col("__npost")) -
          bpNull(col("nn_pre"), col("__npre"))).as("null_delta_bp"),
        when(col("nd_pre") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("nd_post") / col("nd_pre"))
            .cast("long")).as("nd_ratio_bp"))
  }

  /** Cross-modality coverage report — do the text and embedding
    * tables actually line up? One row: doc/vector counts, matched
    * ids, each side's orphans, and text-side coverage in bp. The
    * misaligned-modality check every multimodal ingest runs first
    * (a 60% embedding coverage means the ANN index silently ignores
    * 40% of the corpus).
    *
    * Scale shape: both sides collapse to DISTINCT id columns before
    * the full-outer merge, so the join carries two id sets, not two
    * corpora; output is one row. */
  def modalityCoverage(docs: DataFrame, emb: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id")).distinct()
      .withColumn("__d", lit(1L))
    val e = emb.select(col("vec_id")).distinct()
      .withColumn("__e", lit(1L))
    d.join(e, col("doc_id") === col("vec_id"), "full_outer")
      .agg(
        sum(coalesce(col("__d"), lit(0L))).as("n_docs"),
        sum(coalesce(col("__e"), lit(0L))).as("n_vecs"),
        sum(when(col("__d").isNotNull && col("__e").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("__d").isNotNull && col("__e").isNull, 1L)
          .otherwise(0L)).as("docs_only"),
        sum(when(col("__d").isNull && col("__e").isNotNull, 1L)
          .otherwise(0L)).as("vecs_only"))
      .withColumn("coverage_bp",
        when(col("n_docs") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("n_matched") / col("n_docs"))
            .cast("long")))
  }

  /** Engagement inequality over `keyCol`: the exact Gini coefficient
    * of rows-per-key plus the share of rows owned by the top decile
    * of keys — "do 1% of the users generate 90% of the events", the
    * one-row audit behind bot triage (q112), contributor caps (q132)
    * and per-key rate limits.
    *
    * Exactness at scale without a per-key sort: collapse keys to
    * COUNT-VALUE grain first (m keys share count c), then both
    * statistics are closed-form over the histogram. With keys sorted
    * by count ascending, a count-c block occupying ranks
    * kb+1 … kb+m contributes c·(m·kb + m(m+1)/2) to Σ i·cᵢ, so
    *   gini = (2·Σ i·cᵢ − (n+1)·Σ cᵢ) / (n·Σ cᵢ)
    * needs only a cumulative window over the ≤|distinct counts| rows
    * of the histogram — ties cost nothing because equal counts
    * commute in Σ i·cᵢ. The top decile (k = max(1, ⌊n/10⌋) keys) is
    * the same walk from the other end, the boundary block prorated
    * at count grain — exact, and no per-key tie-break needed since
    * tied keys are interchangeable by value. Products ride
    * decimal(18,0)→(38,0) (the q160 overflow rule); the two ratios
    * are the only doubles, textually mirrored in the oracle.
    *
    * Scale shape: one key-grain shuffle (map-side combined), one
    * count-grain aggregate, then windows over the histogram — whose
    * row count is bounded by the maximum per-key row count, not by
    * the key count. One row: n_keys, n_rows, gini_bp, top_decile_bp.
    */
  def engagementInequality(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d18 = (c: Column) => c.cast("decimal(18,0)")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val hist = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))
    val asc = Window.orderBy(col("c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = sum(col("m")).over(
      Window.orderBy(col("c").asc).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    hist
      .select(col("c"), col("m"),
        coalesce(sum(col("m")).over(asc), lit(0L)).as("kb"),
        coalesce(sum(col("m")).over(desc), lit(0L)).as("kb_desc"),
        n.as("n"))
      // top decile, count grain: the desc walk takes min(m, k - kb_desc)
      // keys (clamped at 0) from each block
      .withColumn("k10", greatest(lit(1L), expr("n div 10")))
      .withColumn("take", greatest(lit(0L),
        least(col("m"), col("k10") - col("kb_desc"))))
      .agg(
        max(col("n")).as("n_keys"),
        sum(col("c") * col("m")).as("n_rows"),
        // scale-0 decimals throughout: m(m+1) is even, so the ⌊/2⌋
        // is exact, and scale-0 products never round (they'd overflow
        // 38 digits first, loudly)
        sum(d18(col("c")) * d18(col("m")) * d18(col("kb")) +
          d18(col("c")) * d38(floor(
            (d18(col("m")) * (d18(col("m")) + lit(1))) / lit(2))))
          .as("__s1"),
        sum(col("c") * col("take")).as("__top_rows"))
      .select(
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        when(coalesce(col("n_rows"), lit(0L)) === 0L, 0L)
          .otherwise(floor(lit(10000.0) *
            (lit(2.0) * col("__s1").cast("double") -
              (col("n_keys").cast("double") + lit(1.0)) *
                col("n_rows").cast("double")) /
            (col("n_keys").cast("double") * col("n_rows").cast("double")))
            .cast("long")).as("gini_bp"),
        when(coalesce(col("n_rows"), lit(0L)) === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("__top_rows") /
            col("n_rows")).cast("long")).as("top_decile_bp"))
  }

  /** Pareto coverage: the MINIMAL number of customers whose summed
    * revenue reaches `targetBp` of the total — the literal "how many
    * customers are 80% of the business" number, with the exact share
    * those customers actually hold ([[engagementInequality]] is the
    * whole-curve summary; this is the one point management asks for).
    *
    * Exact at scale without a per-customer sort: collapse to
    * REVENUE-VALUE grain (m customers share revenue v) and walk the
    * histogram from the top; tied customers are interchangeable so
    * the boundary group is prorated by ⌈need/v⌉ — integer-exact.
    * The one decimal division (the prorate ceil) uses the flog2Ratio
    * convention: an approximate candidate, then exact integer
    * comparisons own the ±1 correction. All sums ride
    * decimal(18,0)→(38,0); total/covered are emitted as BIGINT cents
    * (exact to ±92 quadrillion dollars — beyond any revenue).
    *
    * Zero-revenue customers are excluded (they can never help reach
    * the target; the count is customers WITH revenue). One row:
    * n_customers, n_top, covered_cents, total_cents, top_share_bp. */
  def paretoCoverage(orders: DataFrame, targetBp: Long = 8000L): DataFrame = {
    require(targetBp >= 1L && targetBp <= 10000L,
      "targetBp must be in [1, 10000]")
    import org.apache.spark.sql.expressions.Window
    val d18 = (c: Column) => c.cast("decimal(18,0)")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val hist = orders
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("v"))
      .filter(col("v") > 0L)
      .groupBy(col("v")).agg(count(lit(1)).as("m"))
    val desc = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rows = hist.select(col("v"), col("m"),
        coalesce(sum(d18(col("v")) * d18(col("m"))).over(desc),
          lit(0).cast("decimal(38,0)")).as("cb"),
        sum(d18(col("v")) * d18(col("m"))).over(wAll).as("tot"),
        sum(col("m")).over(wAll).as("nc"))
      // t = ⌈tot·bp/10000⌉: the /10000 quotient terminates at 4
      // decimals, so the scale-6 division is EXACT and floor is safe
      .withColumn("t", d38(floor(
        (col("tot") * lit(targetBp) + lit(9999)) / lit(10000))))
      .withColumn("need", col("t") - col("cb"))
      // candidate ⌈need/v⌉ (scale-6 division may round near integers)
      .withColumn("kc", d38(floor(
        (col("need") + d38(col("v")) - lit(1)) / d38(col("v")))))
      .withColumn("k",
        when(col("need") <= lit(0), lit(0).cast("decimal(38,0)"))
          .when(d18(col("m")) * d18(col("v")) < col("need"),
            d38(d18(col("m")))) // whole group needed, still short
          .otherwise( // exact integer comparisons own the ±1
            when(col("kc") * d38(col("v")) < col("need"), col("kc") + lit(1))
              .when((col("kc") - lit(1)) * d38(col("v")) >= col("need"),
                col("kc") - lit(1))
              .otherwise(col("kc"))))
    rows.agg(
        coalesce(max(col("nc")), lit(0L)).as("n_customers"),
        coalesce(sum(col("k")), lit(0).cast("decimal(38,0)")).as("__k"),
        coalesce(sum(col("k") * d38(col("v"))),
          lit(0).cast("decimal(38,0)")).as("__cov"),
        coalesce(max(col("tot")), lit(0).cast("decimal(38,0)")).as("__tot"))
      .select(col("n_customers"),
        col("__k").cast("long").as("n_top"),
        col("__cov").cast("long").as("covered_cents"),
        col("__tot").cast("long").as("total_cents"))
      // the bp ratio reads the BIGINT columns so the double expression
      // is textually identical to the oracle's
      .withColumn("top_share_bp",
        when(col("total_cents") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("covered_cents") /
            col("total_cents")).cast("long")))
  }

  /** Key churn across a snapshot split — [[profileDrift]] tracks
    * column STATISTICS (null rates, cardinalities); this report
    * tracks key IDENTITY: which keys appeared, which disappeared.
    * A stable cardinality can hide a fully-rotated population (1M
    * users pre, 1M post, zero overlap — drift sees nothing, churn
    * sees everything). One row: pre/post/both key counts, new/lost
    * counts, and new_bp (share of post keys that are new) / lost_bp
    * (share of pre keys that vanished) — the retention-at-key-grain
    * numbers a capacity planner and an anomaly gate both read.
    *
    * Scale shape: ONE fact shuffle to key grain carrying two boolean
    * presence flags (map-side combined), then a 1-row rollup. NULL
    * keys are excluded — identity requires an identity. */
  def keyChurn(df: DataFrame, keyCol: String, tsCol: String,
      splitDate: String): DataFrame = {
    val pre = col(tsCol) < to_timestamp(lit(splitDate))
    val post = col(tsCol) >= to_timestamp(lit(splitDate))
    df
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(when(pre, 1L).otherwise(0L)).as("p"),
        max(when(post, 1L).otherwise(0L)).as("q"))
      .agg(
        sum(col("p")).as("n_pre_keys"),
        sum(col("q")).as("n_post_keys"),
        sum(col("p") * col("q")).as("n_both"),
        sum(when(col("p") === 0L, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("q") === 0L, 1L).otherwise(0L)).as("n_lost"))
      .select(
        coalesce(col("n_pre_keys"), lit(0L)).as("n_pre_keys"),
        coalesce(col("n_post_keys"), lit(0L)).as("n_post_keys"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_lost"), lit(0L)).as("n_lost"))
      .withColumn("new_bp",
        when(col("n_post_keys") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("n_new") / col("n_post_keys"))
            .cast("long")))
      .withColumn("lost_bp",
        when(col("n_pre_keys") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("n_lost") / col("n_pre_keys"))
            .cast("long")))
  }

  /** Benford's-law first-digit bp shares, ⌊10000·log₁₀(1+1/d)⌋ —
    * public constants, precomputed so the audit needs no logarithm
    * at runtime (house no-libm rule). */
  val BenfordBp: Seq[Long] =
    Seq(3010L, 1760L, 1249L, 969L, 791L, 669L, 579L, 511L, 457L)

  /** Benford first-digit audit — the classic fabricated-data /
    * broken-ETL tripwire: naturally-occurring multi-magnitude amounts
    * follow log₁₀(1+1/d) first-digit shares; capped, defaulted, or
    * synthesized values don't. Per digit 1–9: count, observed share
    * (bp), the Benford expectation, and the signed delta — plus the
    * digit rows a broken pipeline leaves EMPTY (the dim is a
    * generated 9-row frame, so a missing digit reports 0, not an
    * absent row).
    *
    * First digit by decimal-string head (pure integer/string ops, no
    * log10); zero and negative amounts are excluded — Benford is
    * defined on positive magnitudes. One fact pass → 9-row report. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val obs = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0L)
      .select(expr(s"CAST(substr(CAST($valueCol AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.functions.{typedLit => tl}
    val dim = obs.sparkSession.range(1, 10)
      .select(col("id").as("digit"),
        element_at(tl(BenfordBp), col("id").cast("int")).as("benford_bp"))
    dim.join(obs, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n"),
        when(col("total") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("n") / col("total"))
            .cast("long")).as("share_bp"),
        col("benford_bp"))
      .withColumn("delta_bp", col("share_bp") - col("benford_bp"))
      .orderBy(col("digit").asc)
  }

  /** K-anonymity risk profile (Sweeney 2002): how many rows sit in a
    * quasi-identifier group smaller than k — each is a re-identification
    * candidate if this table ever leaves the building. The release
    * gate next to the PII scrub (q46/q103) and the erasure audit
    * (q128): scrubbing direct identifiers is not enough when the QI
    * COMBINATION is unique.
    *
    * Output at GROUP-SIZE grain (sizes 1..k−1 observed), not group
    * grain — the risky-group list itself can be huge and is exactly
    * what a report must NOT republish; the histogram is bounded by k:
    * size, n_groups, n_rows, risk_bp (share of ALL table rows exposed
    * at that size). One scan → QI-grain aggregate → ≤k−1-row report
    * (the denominator rides a window over that tiny frame). */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 2L, "need QI columns and k >= 2")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy()
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(whole))
      .filter(col("n") < k)
      .groupBy(col("n").as("size"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_rows"),
        min(col("total")).as("__t"))
      .select(col("size"), col("n_groups"), col("n_rows"),
        floor(lit(10000.0) * col("n_rows") / col("__t")).cast("long")
          .as("risk_bp"))
      .orderBy(col("size").asc)
  }

  /** L-diversity risk profile (Machanavajjhala 2007): the
    * k-anonymity follow-up — a LARGE QI group is still unsafe when
    * every member shares the same sensitive value (homogeneity
    * attack: group size 100, all 'DELINQUENT' → membership alone
    * leaks the attribute). Per QI group, the number of DISTINCT
    * sensitive values; groups below `l` report at diversity grain:
    * diversity, n_groups, n_rows, risk_bp. Same one-scan shape as
    * [[kAnonymityProfile]] with a two-level aggregate (QI+sensitive
    * grain collapses first, so the distinct count is a plain count —
    * no Expand). */
  def lDiversityProfile(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty && l >= 2L, "need QI columns and l >= 2")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy()
    df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("diversity"), sum(col("n")).as("n"))
      .withColumn("total", sum(col("n")).over(whole))
      .filter(col("diversity") < l)
      .groupBy(col("diversity"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_rows"),
        min(col("total")).as("__t"))
      .select(col("diversity"), col("n_groups"), col("n_rows"),
        floor(lit(10000.0) * col("n_rows") / col("__t")).cast("long")
          .as("risk_bp"))
      .orderBy(col("diversity").asc)
  }

  /** T-closeness risk profile (Li et al. 2007) — the third member of
    * the release-gate trio (k-anonymity q214, l-diversity q215): a
    * large, diverse QI group STILL leaks when its sensitive-value
    * distribution differs sharply from the table's (skewness attack:
    * the group is 90% 'DELINQUENT' vs 5% globally — membership shifts
    * the prior). Distance is TOTAL VARIATION, the no-libm member of
    * the distance family (the q156 drift convention; the paper's EMD
    * needs a ground metric the schema doesn't carry), computed by the
    * one-sided identity TV = Σ_v (p_class(v) − p_global(v))⁺ — only
    * values PRESENT in the class contribute, so one pass over the
    * observed (class, value) grain suffices.
    *
    * Exact rational arithmetic: per value, (n_cv·N_g − g_v·N_c)⁺ in
    * decimal(38,0) (Long products overflow at real row counts), one
    * double division per class for tv_bp. Output at tv-band grain
    * (band = tv_bp div bandBp — bounded), never group grain. */
  def tClosenessProfile(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, bandBp: Long = 1000L): DataFrame = {
    require(qiCols.nonEmpty && bandBp >= 1L, "need QI columns and a band")
    val dec = "decimal(38,0)"
    val qi = qiCols.map(col)
    val gs = df
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
      .persist() // feeds the global, class, and scalar aggregates
    val gv = gs.groupBy(col(sensitiveCol)).agg(sum(col("n")).as("g"))
    val gc = gs.groupBy(qi: _*).agg(sum(col("n")).as("nc"))
    val tot = gs.agg(sum(col("n")).as("ng"))
    val tv = gs
      .join(broadcast(gv), Seq(sensitiveCol))
      .join(gc, qiCols)
      .crossJoin(broadcast(tot))
      .withColumn("__pos", greatest(
        expr(s"CAST(n AS $dec) * CAST(ng AS $dec)" +
          s" - CAST(g AS $dec) * CAST(nc AS $dec)"),
        lit(0L).cast(dec)))
      .groupBy(qi :+ col("nc") :+ col("ng"): _*)
      .agg(sum(col("__pos")).as("__s"))
      .withColumn("tv_bp",
        floor(lit(10000.0) * col("__s").cast("double") /
          (col("nc").cast("double") * col("ng").cast("double")))
          .cast("long"))
    tv.groupBy(expr(s"tv_bp div ${bandBp}L").as("tv_band"))
      .agg(count(lit(1)).as("n_groups"), sum(col("nc")).as("n_rows"),
        max(col("tv_bp")).as("max_tv_bp"))
      .orderBy(col("tv_band").asc)
  }

  /** Per-source data card: the one-row-per-source summary a corpus
    * README publishes — volume (docs, tokens, chars), hygiene (null
    * and exact-dup rates), and breadth (distinct languages). The
    * source-grain composition of [[profile]]'s table-grain counts
    * with the q18/q21 text metrics, so a mixture designer can read
    * every source's vitals off one frame before weighting it.
    *
    * ONE documents scan → one source-grain aggregate. The two exact
    * distinct counts (texts, langs) make Catalyst plan an Expand ×3
    * before the shuffle — the [[profile]] trade, exact and oracle-able;
    * at 100 TB pass `exact = false`: both become
    * approx_count_distinct exactly as [[profileApprox]] does (no
    * Expand, fixed-size mergeable sketches), gated by
    * [[sourceDatacardChecked]]. Token counts guard null text
    * explicitly (Spark's non-ANSI size(split(NULL)) = −1 trap, q64's
    * lesson). Rates are floor-bp; averages are BIGINT floor divisions
    * (all operands non-negative, so Spark's truncating DIV and
    * DuckDB's flooring // agree). Columns: source, n_docs, n_text,
    * null_bp, n_distinct_texts, dup_bp, tot_tokens, avg_tokens,
    * tot_chars, n_langs — sorted by source. */
  def sourceDatacard(docs: DataFrame, exact: Boolean = true,
      rsd: Double = 0.015): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    def nd(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), rsd)
    docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("text")).as("n_text"),
        nd("text").as("n_distinct_texts"),
        sum(when(col("text").isNotNull, toks).otherwise(0L)).as("tot_tokens"),
        sum(coalesce(col("n_chars"), lit(0L))).as("tot_chars"),
        nd("lang").as("n_langs"))
      .select(
        col("source"), col("n_docs"), col("n_text"),
        floor(lit(10000.0) * (col("n_docs") - col("n_text")) / col("n_docs"))
          .cast("long").as("null_bp"),
        col("n_distinct_texts"),
        when(col("n_text") === 0L, lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (col("n_text") - col("n_distinct_texts")) / col("n_text"))
            .cast("long")).as("dup_bp"),
        col("tot_tokens"),
        when(col("n_text") === 0L, lit(null).cast("long"))
          .otherwise(expr("tot_tokens div n_text")).as("avg_tokens"),
        col("tot_chars"), col("n_langs"))
      .orderBy(col("source").asc)
  }

  /** Sketch gate for the [[sourceDatacard]] HLL path (q37 machinery):
    * exact distinct counts plus bounded-error verdicts on both
    * sketches. Deterministic output (oracle: exact values + literal
    * 1); a sketch past `maxErrBp` flips its verdict and the row
    * hash-mismatches. The mixed exact/sketch aggregate is
    * gate-shaped — production uses `sourceDatacard(exact = false)`. */
  def sourceDatacardChecked(docs: DataFrame, rsd: Double = 0.015,
      maxErrBp: Long = 500L): DataFrame = {
    def ok(sk: String, ex: String) =
      (abs(col(sk) - col(ex)) * lit(10000L) <= col(ex) * lit(maxErrBp))
        .cast("int")
    docs
      .groupBy(col("source"))
      .agg(
        countDistinct(col("text")).as("n_distinct_texts"),
        approx_count_distinct(col("text"), rsd).as("__sk_texts"),
        countDistinct(col("lang")).as("n_langs"),
        approx_count_distinct(col("lang"), rsd).as("__sk_langs"))
      .select(col("source"), col("n_distinct_texts"), col("n_langs"),
        ok("__sk_texts", "n_distinct_texts").as("texts_sketch_ok"),
        ok("__sk_langs", "n_langs").as("langs_sketch_ok"))
      .orderBy(col("source").asc)
  }

  /** Join-cardinality estimator audit — the optimizer-stats health
    * check: the textbook System-R estimate |A⋈B| ≈ |A|·|B| /
    * max(ndv_A, ndv_B) (uniformity + containment assumptions) against
    * the TRUE join size, scored as the q-error
    * max(pred, actual)/min(pred, actual) (Moerkotte et al. 2009 — the
    * metric plan-quality papers use, symmetric in over/under). The
    * table to run before trusting any CBO join reorder on a new
    * dataset: a q-error of 1.0 means the uniformity assumption holds;
    * skewed keys blow it up and the plan that "looked" cheapest
    * wasn't.
    *
    * The true size is computed WITHOUT materializing the join:
    * Σ cnt_A(k)·cnt_B(k) over matched keys — key-grain aggregates on
    * both sides, one key-grain join; fact rows are counted, never
    * paired. All arithmetic DECIMAL(38,0) (HUGEINT twin), quotients
    * by truncating DIV.
    *
    * One row: n_left, n_right, ndv_left, ndv_right, actual_rows,
    * predicted_rows, q_error_milli, underestimated. */
  def joinCardinalityAudit(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // each key-grain frame feeds its totals AND the matched-key sum —
    // persist so each fact side is scanned once (caller-owns-cache)
    val la = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
      .persist()
    val ra = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
      .persist()
    val ls = la.agg(sum(col("cl")).as("n_left"),
      count(lit(1)).as("ndv_left"))
    val rs = ra.agg(sum(col("cr")).as("n_right"),
      count(lit(1)).as("ndv_right"))
    val actual = la.join(ra, Seq("k"))
      .agg(coalesce(sum(dec(col("cl")) * dec(col("cr"))),
        dec(lit(0L))).as("actual_rows"))
    actual.crossJoin(broadcast(ls)).crossJoin(broadcast(rs))
      .withColumn("predicted_rows", expr(
        """(CAST(n_left AS DECIMAL(38,0)) * n_right)
          |  DIV greatest(ndv_left, ndv_right)""".stripMargin))
      .select(col("n_left"), col("n_right"), col("ndv_left"),
        col("ndv_right"),
        col("actual_rows").cast("long").as("actual_rows"),
        col("predicted_rows"),
        when(col("actual_rows") === dec(lit(0L)) ||
          col("predicted_rows") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            """(1000 * CAST(greatest(CAST(actual_rows AS DECIMAL(38,0)),
              |              CAST(predicted_rows AS DECIMAL(38,0))) AS DECIMAL(38,0)))
              |  DIV least(CAST(actual_rows AS DECIMAL(38,0)),
              |            CAST(predicted_rows AS DECIMAL(38,0)))""".stripMargin))
          .as("q_error_milli"),
        (col("predicted_rows") < col("actual_rows").cast("long"))
          .cast("int").as("underestimated"))
  }

  /** Props key DRIFT — the data-contract monitor [[propsSchema]]'s
    * onboarding profile becomes once a producer is live: per JSON
    * key, its presence rate BEFORE vs AFTER the split date, the rate
    * delta, and a status verdict (`new` = a producer started
    * emitting a field nobody declared, `dropped` = a field consumers
    * may still read went dark, `present` otherwise). Catches the
    * schema changes upstream teams ship without telling anyone —
    * q109 watches value DISTRIBUTIONS drift, this watches the
    * key set itself.
    *
    * The q138 accounting rule carries over: invalid-JSON rows
    * contribute no keys but stay in their side's denominator (a
    * producer replacing JSON with garbage shows as every key's rate
    * collapsing, not as a silently shrinking denominator). Side
    * totals ride the same sentinel-row trick.
    *
    * Scale shape: one pruned scan explodes to (side, key) grain —
    * key-vocabulary bounded — and the report is key-grain. All
    * arithmetic integral.
    *
    * Columns: key, ref_n, cur_n, ref_bp, cur_bp, delta_bp, status. */
  def propsKeyDrift(df: DataFrame, splitDate: String,
      jsonCol: String = "props"): DataFrame = {
    val parsed = from_json(col(jsonCol),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    val sentinel = struct(lit(true).as("s"),
      lit(null).cast("string").as("key"))
    val entries = transform(
      map_entries(coalesce(parsed, map())),
      e => struct(lit(false).as("s"), e.getField("key").as("key")))
    val grain = df
      .filter(col("ts").isNotNull)
      .select(
        when(to_date(col("ts")) < lit(splitDate).cast("date"), lit("ref"))
          .otherwise(lit("cur")).as("side"),
        explode(concat(array(sentinel), entries)).as("e"))
      .select(col("side"), col("e.s").as("s"), col("e.key").as("key"))
      .groupBy(col("side"), col("s"), col("key"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    grain
      .withColumn("ref_total", coalesce(max(when(
        col("s") && col("side") === "ref", col("n"))).over(wAll), lit(0L)))
      .withColumn("cur_total", coalesce(max(when(
        col("s") && col("side") === "cur", col("n"))).over(wAll), lit(0L)))
      .filter(!col("s"))
      .groupBy(col("key"), col("ref_total"), col("cur_total"))
      .agg(sum(when(col("side") === "ref", col("n")).otherwise(0L))
        .as("ref_n"),
        sum(when(col("side") === "cur", col("n")).otherwise(0L))
          .as("cur_n"))
      .select(col("key"), col("ref_n"), col("cur_n"),
        when(col("ref_total") > 0L, expr("(10000 * ref_n) DIV ref_total"))
          .as("ref_bp"),
        when(col("cur_total") > 0L, expr("(10000 * cur_n) DIV cur_total"))
          .as("cur_bp"),
        (when(col("cur_total") > 0L, expr("(10000 * cur_n) DIV cur_total"))
          - when(col("ref_total") > 0L,
            expr("(10000 * ref_n) DIV ref_total"))).as("delta_bp"),
        when(col("ref_n") === 0L && col("cur_n") > 0L, "new")
          .when(col("ref_n") > 0L && col("cur_n") === 0L, "dropped")
          .otherwise(lit("present")).as("status"))
      .orderBy(col("key").asc)
  }

  /** Join-ORDER planner audit — q306's q-error question asked where
    * it actually bites: given the star chain σ(orders) ⋈ lineitem ⋈
    * σ(part), the optimizer's real decision is WHICH two-way join to
    * run first, made by comparing System-R intermediate estimates
    * |A|·|B|/max(ndv). This audit computes, per candidate order, the
    * ESTIMATED and the TRUE intermediate size (true sizes at key
    * grain — fact rows counted, never paired: Σ c_filtered(k)·c_l(k),
    * and the 3-way via the (orderkey, partkey) pair grain), the
    * Moerkotte q-error, and whether the estimate-ranked choice
    * matches the truth-ranked one — `cbo_pick` vs `oracle_pick` per
    * row; the audit passes when they land on the same plan.
    *
    * Estimator conventions (textbook System-R): filtered dimension
    * keys are primary (ndv = row count); the intermediate inherits
    * the fact's ndv on the NEXT join key; all arithmetic integral
    * DIV over decimal(38,0).
    *
    * Scale shape: both fact collapses are key-grain aggregates off
    * one persisted pair-grain frame; dimensions collapse to key sets;
    * every "join" here is key-grain against broadcast-bounded sides.
    * Output: 2 rows (plan ∈ orders_first, part_first).
    *
    * Columns: plan, est_intermediate, true_intermediate,
    * q_error_milli, est_final, true_final, cbo_pick, oracle_pick. */
  def joinOrderAudit(orders: DataFrame, lineitem: DataFrame,
      part: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // pair-grain fact collapse feeds both key grains and the 3-way
    val lp = lineitem
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .groupBy(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val lOk = lp.groupBy(col("ok")).agg(sum(col("c")).as("cl"))
    val lPk = lp.groupBy(col("pk")).agg(sum(col("c")).as("cl"))
    val oKeys = orders.select(col("o_orderkey").as("ok")).localCheckpoint(false)
    val pKeys = part.select(col("p_partkey").as("pk")).localCheckpoint(false)
    val lStats = lp.agg(sum(col("c")).as("n_l"),
      countDistinct(col("ok")).as("ndv_ok"),
      countDistinct(col("pk")).as("ndv_pk"))
    val oStats = oKeys.agg(count(lit(1)).as("n_o"))
    val pStats = pKeys.agg(count(lit(1)).as("n_p"))
    val trueOL = lOk.join(oKeys, Seq("ok"))
      .agg(coalesce(sum(col("cl")), lit(0L)).as("true_ol"))
    val trueLP = lPk.join(pKeys, Seq("pk"))
      .agg(coalesce(sum(col("cl")), lit(0L)).as("true_lp"))
    val true3 = lp.join(oKeys, Seq("ok")).join(pKeys, Seq("pk"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("true_final"))
    val base = trueOL.crossJoin(broadcast(trueLP))
      .crossJoin(broadcast(true3))
      .crossJoin(broadcast(lStats)).crossJoin(broadcast(oStats))
      .crossJoin(broadcast(pStats))
      // System-R: filtered dims are key-unique (ndv = n); the
      // intermediate keeps the fact's ndv on the other key
      .withColumn("est_ol", expr(
        s"(CAST(n_o AS $dec) * n_l) DIV greatest(n_o, ndv_ok)"))
      .withColumn("est_lp", expr(
        s"(CAST(n_l AS $dec) * n_p) DIV greatest(ndv_pk, n_p)"))
      .withColumn("est_f1", expr(
        s"(CAST(est_ol AS $dec) * n_p) DIV greatest(ndv_pk, n_p)"))
      .withColumn("est_f2", expr(
        s"(CAST(est_lp AS $dec) * n_o) DIV greatest(ndv_ok, n_o)"))
    def qerr(est: String, tru: String) = expr(
      s"""CASE WHEN least(CAST($est AS $dec), CAST($tru AS $dec)) = 0
         | THEN NULL
         | ELSE CAST((1000 * greatest(CAST($est AS $dec),
         |   CAST($tru AS $dec))) DIV least(CAST($est AS $dec),
         |   CAST($tru AS $dec)) AS BIGINT) END""".stripMargin)
    base
      .select(explode(array(
        struct(lit("orders_first").as("plan"),
          col("est_ol").cast("long").as("est_intermediate"),
          col("true_ol").as("true_intermediate"),
          qerr("est_ol", "true_ol").as("q_error_milli"),
          col("est_f1").cast("long").as("est_final"),
          col("true_final").as("true_final")),
        struct(lit("part_first").as("plan"),
          col("est_lp").cast("long").as("est_intermediate"),
          col("true_lp").as("true_intermediate"),
          qerr("est_lp", "true_lp").as("q_error_milli"),
          col("est_f2").cast("long").as("est_final"),
          col("true_final").as("true_final")))).as("r"))
      .select(col("r.*"))
      .withColumn("cbo_pick",
        (col("est_intermediate") === min(col("est_intermediate")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("int"))
      .withColumn("oracle_pick",
        (col("true_intermediate") === min(col("true_intermediate")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("int"))
      .orderBy(col("plan").asc)
  }

  /** Functional-dependency audit for one declared candidate A→B —
    * the profiling primitive behind FD-discovery tools (TANE / HyFD
    * lineage): does column A determine column B, and if not, how far
    * off is the data? Scored with the standard g3 error (Kivinen &
    * Mannila '95): the minimum fraction of rows to delete so the FD
    * holds, = (N − Σ_A max_b count(A,b))/N. An exact-key FD reads
    * g3 = 0 / holds = 1; a violated one reports both the violating
    * group count (how many keys are inconsistent) and g3 (how much
    * data disagrees) — the two reads diverge under skew, which is why
    * both are published.
    *
    * Scale shape: one pruned scan collapses to (A, B) cell grain,
    * then A grain, then a 1-row report — the same two-hash-aggregate
    * ladder as the contingency screen; nothing wider than the cell
    * frame ever shuffles. All arithmetic integral (one terminal DIV).
    *
    * Columns: tbl, lhs, rhs, n_rows, n_groups, violating_groups,
    * g3_bp (NULL on empty input), holds. */
  def fdAudit(df: DataFrame, lhs: String, rhs: String,
      table: String): DataFrame = {
    val cells = df.filter(col(lhs).isNotNull && col(rhs).isNotNull)
      .groupBy(col(lhs).cast("string").as("__l"),
        col(rhs).cast("string").as("__r"))
      .agg(count(lit(1)).as("o"))
    val grp = cells.groupBy(col("__l"))
      .agg(sum(col("o")).as("tot"), max(col("o")).as("keep"),
        count(lit(1)).as("rhs_n"))
    grp.agg(
        coalesce(sum(col("tot")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("rhs_n") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("violating_groups"),
        coalesce(sum(col("keep")), lit(0L)).as("__keep"))
      .select(lit(table).as("tbl"), lit(lhs).as("lhs"),
        lit(rhs).as("rhs"), col("n_rows"), col("n_groups"),
        col("violating_groups"),
        when(col("n_rows") > 0L,
          expr("(10000 * (n_rows - __keep)) DIV n_rows")).as("g3_bp"),
        when(col("n_rows") > 0L && col("violating_groups") === 0L, 1)
          .otherwise(0).as("holds"))
  }

  /** Pearson χ² + Cramér's V for one R×C categorical pair — the
    * general-contingency complement of q274's 2×2 closed form and the
    * standard feature-association screen (rank candidate features /
    * detect redundant ones before training): V = √(χ²/(N·(k−1))),
    * k = min(R, C), 0 ≤ V ≤ 1.
    *
    * Cross-engine arithmetic: per cell the χ² term
    * (O−E)²/E = (O·N−R·C)²/(N·R·C) is floored at MICRO precision with
    * one integral decimal(38,0) division, then summed exactly — the
    * floor bias is ≤ #cells·1e-6 and both engines agree bit-for-bit
    * (no per-cell float accumulation, whose order is
    * parallelism-dependent). The terminal V is
    * ⌊10⁴·√(χ²_micro/(10⁶·N·(k−1)))⌋ — one IEEE division + one IEEE
    * sqrt of exactly-computed integers (the cosBp rule).
    *
    * The sum runs over the FULL R×C level grid, not just observed
    * cells: a zero cell still contributes (R·C)²/(N·R·C) = R·C/N —
    * dropping the absent cells understates χ² (a perfect-association
    * 2×2 would read half its true value). The grid is built by
    * crossing the two margin frames — level grain, bounded metadata.
    *
    * Scale shape: ONE pruned scan of the input collapses to CELL
    * grain (≤ R·C rows, persisted — caller owns the cache per the
    * package convention); margins, the grid, and the report are all
    * level-grain metadata. The multi-distinct level count plans as
    * one Expand over grid grain, not the fact.
    *
    * Columns: feature_a, feature_b (declared labels), n, r_levels,
    * c_levels, dof, chi2_milli, v_bp (NULL when degenerate). */
  def cramersV(df: DataFrame, aCol: Column, bCol: Column,
      labelA: String, labelB: String): DataFrame =
    cramersVMany(Seq((df, aCol, bCol, labelA, labelB)))

  /** N Cramér's-V contingency reads through ONE aggregation tree.
    *
    * The single-pair [[cramersV]] pays ~6 query stages (cells
    * exchange, two margin aggregates, two broadcasts, the grid join,
    * the final aggregate); a screen over N declared pairs as N
    * independent subtrees pays N× that in stage/AQE-materialization
    * overhead while every post-cells frame is contingency-grain
    * METADATA (R·C cells). Here each pair collapses to its cell
    * grain in its own scan (that part is irreducible — different
    * source tables), the tagged cell frames union into one persisted
    * frame, and the margins / grid / χ² ladder runs ONCE keyed by
    * (feature_a, feature_b) — same integer arithmetic per pair,
    * identical output, ~4 shared stages instead of ~6·N.
    *
    * Zero cells still contribute: the grid is the aM×bM product per
    * pair, left-joined against observed cells (r·cc > 0 for every
    * margin row by construction, so the DIV is always defined). */
  def cramersVMany(
      pairs: Seq[(DataFrame, Column, Column, String, String)]): DataFrame = {
    require(pairs.nonEmpty, "at least one pair")
    require(pairs.map(p => (p._4, p._5)).distinct.size == pairs.size,
      "pair labels must be distinct (they key the shared ladder)")
    val dec = "decimal(38,0)"
    val keys = Seq("feature_a", "feature_b")
    val cells = pairs.map { case (df, aCol, bCol, labelA, labelB) =>
      df.filter(aCol.isNotNull && bCol.isNotNull)
        .groupBy(aCol.cast("string").as("__a"),
          bCol.cast("string").as("__b"))
        .agg(count(lit(1)).as("o"))
        .select(lit(labelA).as("feature_a"), lit(labelB).as("feature_b"),
          col("__a"), col("__b"), col("o"))
    }.reduce(_ unionByName _).persist()
    val aM = cells.groupBy(col("feature_a"), col("feature_b"), col("__a"))
      .agg(sum(col("o")).as("r"))
    val bM = cells.groupBy(col("feature_a"), col("feature_b"), col("__b"))
      .agg(sum(col("o")).as("cc"))
    val nRow = cells.groupBy(col("feature_a"), col("feature_b"))
      .agg(sum(col("o")).as("n"))
    val grid = aM
      .join(broadcast(bM), keys)
      .join(broadcast(nRow), keys)
      .join(cells, keys ++ Seq("__a", "__b"), "left")
      .withColumn("d",
        coalesce(col("o"), lit(0L)) * col("n") - col("r") * col("cc"))
    val agg = grid.groupBy(col("feature_a"), col("feature_b"))
      .agg(
        max(col("n")).as("n"),
        countDistinct(col("__a")).as("r_levels"),
        countDistinct(col("__b")).as("c_levels"),
        sum(expr(
          s"""(CAST(1000000 AS $dec) * CAST(d AS $dec) * CAST(d AS $dec))
             |DIV (CAST(n AS $dec) * CAST(r AS $dec) * CAST(cc AS $dec))"""
            .stripMargin)).as("__chi2_micro"))
    // label spine: a pair over an EMPTY input must still report its
    // (n=0, levels=0, dof=0, chi2=0, v_bp=NULL) row — the grouped agg
    // alone would drop it (the single-pair global agg never did)
    val spark = pairs.head._1.sparkSession
    val spine = pairs.map { case (_, _, _, labelA, labelB) =>
      spark.range(1).select(lit(labelA).as("feature_a"),
        lit(labelB).as("feature_b"))
    }.reduce(_ unionByName _)
    spine.join(agg, keys, "left")
      .select(
        col("feature_a"), col("feature_b"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("r_levels"), lit(0L)).as("r_levels"),
        coalesce(col("c_levels"), lit(0L)).as("c_levels"),
        (greatest(coalesce(col("r_levels"), lit(0L)), lit(1L)) - 1L)
          .multiply(greatest(coalesce(col("c_levels"), lit(0L)), lit(1L)) - 1L)
          .cast("long").as("dof"),
        coalesce(expr(s"CAST(__chi2_micro DIV 1000 AS BIGINT)"), lit(0L))
          .as("chi2_milli"),
        when(coalesce(col("n"), lit(0L)) > 0L &&
          least(col("r_levels"), col("c_levels")) > 1L,
          floor(lit(10000.0) *
            sqrt(col("__chi2_micro").cast("double") /
              (lit(1000000L) * col("n") *
                (least(col("r_levels"), col("c_levels")) - 1L))
                .cast("double"))).cast("long"))
          .as("v_bp"))
  }

  /** Population stability index of order value between the two
    * halves of the order-date span — the scorecard-industry drift
    * number (the banking-model monitoring standard; >0.25 = "rebuild
    * the model"), with bins that are REFERENCE-half equi-depth
    * deciles, so the metric is scale-free and every reference bin
    * starts near 10%. q109's value drift uses fixed-width buckets
    * and TVD (robust, bounded); PSI's log term amplifies tail bins
    * that TVD underweights — the pair disagreeing localizes WHERE
    * the distribution moved.
    *
    * Ladder: reference decile edges at VALUE grain (the q203
    * equi-depth walk), both halves counted per bin with add-1
    * smoothing, shares in floored ppm, per-bin term
    * ⌊10⁶·(p−q)·ln(p/q)⌋ — the only doubles, each floored per bin
    * BEFORE the (integer) total, textually mirrored in the oracle
    * (the engagementInequality doubles rule).
    *
    * Scale shape: one fact pass to (half, cents-value) grain, the
    * decile walk at value grain, the bin assignment a ≤10-row
    * broadcast range join, ≤10 rows out.
    *
    * Columns: bin, lo_cents, hi_cents (NULL = open), ref_n, cur_n,
    * ref_ppm, cur_ppm, term_micro. */
  def psiDrift(orders: DataFrame, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2 && bins <= 100, "bins in [2,100]")
    val base = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .select(
        expr("CAST(datediff(to_date(o_orderdate), '1970-01-01')" +
          " AS BIGINT)").as("d"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
    val mid = base.agg(
      expr("CAST((min(d) + max(d)) DIV 2 AS BIGINT)").as("mid"))
    val sides = base.crossJoin(broadcast(mid))
      .select(when(col("d") <= col("mid"), lit("ref")).otherwise("cur")
        .as("side"), col("cents"))
      .groupBy(col("side"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // edge walk + two bin counts
    // reference equi-depth edges at value grain (q203): bin of a
    // reference row at cum position p is (p-1)*bins DIV n + 1
    val wv = Window.orderBy(col("cents"))
    val refBins = sides.filter(col("side") === "ref")
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("n", sum(col("cnt")).over(Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("bin",
        expr(s"(cum - 1) * $bins DIV n + 1"))
      .groupBy(col("bin"))
      .agg(min(col("cents")).as("__lo0"), max(col("cents")).as("hi"),
        sum(col("cnt")).as("ref_n"))
    // contiguous edges: bin b covers (hi_{b-1}, hi_b]; first lo open
    val edges = refBins
      .withColumn("lo", lag(col("hi"), 1).over(Window.orderBy(col("bin"))))
      .select(col("bin"), col("lo"), col("hi"), col("ref_n"))
      .localCheckpoint(false)
    val curN = sides.filter(col("side") === "cur")
      .join(broadcast(edges.select(col("bin"), col("lo"), col("hi"),
        max(col("bin")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .as("maxb"))),
        (col("lo").isNull || col("cents") > col("lo")) &&
          (col("cents") <= col("hi") || col("bin") === col("maxb")))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("cur_n"))
    edges.join(curN, Seq("bin"), "left")
      .select(col("bin"), col("lo").as("lo_cents"),
        col("hi").as("hi_cents"), col("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .withColumn("__rt", sum(col("ref_n") + 1L).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("__ct", sum(col("cur_n") + 1L).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      // clamp both shares to ≥1 ppm: once a half exceeds ~1e6 rows a
      // drained bin's add-1-smoothed share floors to 0 and ln(p/q)
      // diverges (+Inf casts to Long.MaxValue here, errors in
      // DuckDB) — the greatest(·,1) floor keeps the log term finite
      // and identical on both engines (round-9 advice)
      .withColumn("ref_ppm",
        expr("greatest((1000000 * (ref_n + 1)) DIV __rt, 1)"))
      .withColumn("cur_ppm",
        expr("greatest((1000000 * (cur_n + 1)) DIV __ct, 1)"))
      .withColumn("term_micro",
        floor((col("ref_ppm") - col("cur_ppm")).cast("double") *
          log(col("ref_ppm").cast("double") /
            col("cur_ppm").cast("double"))).cast("long"))
      .select(col("bin"), col("lo_cents"), col("hi_cents"),
        col("ref_n"), col("cur_n"), col("ref_ppm"), col("cur_ppm"),
        col("term_micro"))
      .orderBy(col("bin").asc)
  }

  /** James–Stein shrunk per-source means — the empirical-Bayes
    * correction (Stein 1961; Efron & Morris 1975's batting-average
    * form) for the winner's-curse every per-source league table
    * suffers: a small source's raw mean doc length is mostly noise,
    * and ranking by raw means systematically crowns small-n flukes.
    * Each source's mean shrinks toward the grand mean by
    *   B_i = σ²_w/n_i / (σ²_w/n_i + τ²),  τ² = max(0, between-var −
    *   mean within-SE²),
    * the standard method-of-moments EB estimator: noisy means shrink
    * hard, well-measured ones barely move.
    *
    * Exact milli/bp ladder (decimal cross-moments, the mdePower
    * variance shape; B in bp via one DIV — both engines floor
    * identically). A `rank_moved` column counts how far the source
    * moved between the raw and shrunk league tables — the
    * winner's-curse receipt.
    *
    * Scale shape: one corpus pass to source-grain moments, the
    * ladder at source grain (≤ sources rows), two rank windows over
    * that grain. Columns: source, n_docs, raw_mean_milli,
    * shrunk_mean_milli, shrink_bp (B_i — 10000 = collapsed to the
    * grand mean), rank_raw, rank_shrunk, rank_moved. */
  def jamesSteinMeans(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val mo = docs
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
        sum(expr(s"CAST(n_chars AS $dec) * n_chars")).as("q"))
      .localCheckpoint(false) // grand moments + the ladder
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val g = mo
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("gn", sum(col("n")).over(wAll))
      .withColumn("gs", sum(col("s")).over(wAll))
      .withColumn("raw_mean_milli", expr("(1000 * s) DIV n"))
      .withColumn("grand_milli", expr("(1000 * gs) DIV gn"))
      // within-source variance (milli² scale), pooled across sources
      .withColumn("__vw_milli", when(col("n") > 1L, expr(
        s"""CAST((1000000 * (n * q - CAST(s AS $dec) * s))
           |DIV (CAST(n AS $dec) * (n - 1)) AS BIGINT)""".stripMargin)))
      .withColumn("__pool_vw", expr(
        s"""CAST(sum(CAST(__vw_milli AS $dec) * (n - 1)) OVER ()
           |DIV greatest(sum(n - 1) OVER (), 1) AS BIGINT)"""
          .stripMargin))
      // between-source variance of raw means (milli²)
      .withColumn("__dev", col("raw_mean_milli") - col("grand_milli"))
      .withColumn("__between", expr(
        s"""CAST(sum(CAST(__dev AS $dec) * __dev) OVER ()
           |DIV greatest(k - 1, 1) AS BIGINT)""".stripMargin))
      // τ² = max(0, between − mean within-SE²); SE²_i = vw/n_i
      .withColumn("__mean_se2",
        expr("sum(__pool_vw DIV n) OVER () DIV k"))
      .withColumn("__tau2",
        greatest(col("__between") - col("__mean_se2"), lit(0L)))
      // B_i in bp: SE²_i / (SE²_i + τ²)
      .withColumn("__se2", expr("__pool_vw DIV n"))
      .withColumn("shrink_bp",
        when(col("__se2") + col("__tau2") > 0L,
          expr("(10000 * __se2) DIV (__se2 + __tau2)"))
          .otherwise(lit(0L)))
      .withColumn("shrunk_mean_milli",
        col("raw_mean_milli") -
          expr(s"""CAST((CASE WHEN __dev < 0 THEN -1 ELSE 1 END)
            | * ((shrink_bp * abs(CAST(__dev AS $dec))) DIV 10000)
            |AS BIGINT)""".stripMargin))
    val wRaw = Window.orderBy(col("raw_mean_milli").desc,
      col("source").asc)
    val wShr = Window.orderBy(col("shrunk_mean_milli").desc,
      col("source").asc)
    g.withColumn("rank_raw", row_number().over(wRaw).cast("long"))
      .withColumn("rank_shrunk", row_number().over(wShr).cast("long"))
      .select(col("source"), col("n").as("n_docs"),
        col("raw_mean_milli"), col("shrunk_mean_milli"),
        col("shrink_bp"), col("rank_raw"), col("rank_shrunk"),
        abs(col("rank_raw") - col("rank_shrunk")).as("rank_moved"))
      .orderBy(col("source").asc)
  }

  /** Monthly revenue-concentration trend — [[engagementInequality]]
    * unrolled over time: the exact Gini of customer revenue and the
    * top-decile share, one row per calendar month. A static Gini
    * says "concentrated"; the TREND says "concentrating" — the
    * platform-risk read (rising Gini = a whale problem forming)
    * that a single pooled number hides entirely.
    *
    * Exact integer ladder per month: customers ranked (cents asc,
    * custkey asc — ties commute in Σi·cᵢ so the id tie-break cannot
    * change the sum), Gini_bp = ⌊10⁴·(2·Σi·cᵢ − (n+1)·Σcᵢ) /
    * (n·Σcᵢ)⌋ in decimal(38,0); the top decile is the k =
    * max(1, n div 10) largest customers' share.
    *
    * Scale shape: one fact pass to (month, customer) grain, two
    * month-partitioned windows (months parallelize; a month's
    * customer set is the partition), month-grain output.
    *
    * Columns: month, n_customers, revenue_cents, gini_bp,
    * top_decile_bp. */
  def giniTrend(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val cm = orders
      .filter(col("o_orderdate").isNotNull && col("o_custkey").isNotNull)
      .groupBy(
        expr("(year(o_orderdate) * 12 + month(o_orderdate) - 1)")
          .cast("long").as("m"),
        col("o_custkey").as("cust"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
        .as("cents"))
    val wAsc = Window.partitionBy(col("m"))
      .orderBy(col("cents").asc, col("cust").asc)
    val wDesc = Window.partitionBy(col("m"))
      .orderBy(col("cents").desc, col("cust").desc)
    val wM = Window.partitionBy(col("m"))
    cm
      .withColumn("i", row_number().over(wAsc).cast("long"))
      .withColumn("rd", row_number().over(wDesc).cast("long"))
      .withColumn("k10",
        greatest(lit(1L), (count(lit(1)).over(wM) / 10).cast("long")))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("revenue_cents"),
        sum(expr(s"CAST(i AS $dec) * cents")).as("__s1"),
        sum(when(col("rd") <= col("k10"), col("cents")).otherwise(0L))
          .as("__top"))
      .withColumn("gini_bp", when(col("revenue_cents") > 0L, expr(
        s"""CAST((10000 * (2 * __s1
           |  - (CAST(n_customers AS $dec) + 1) * revenue_cents))
           |DIV (CAST(n_customers AS $dec) * revenue_cents) AS BIGINT)"""
          .stripMargin)))
      // 10000·__top in decimal(38,0): past ~9.2e14 cents in one
      // month's top decile the Long×Long product wraps where the
      // oracle's HUGEINT errors — the same boundary-product rule as
      // gini_bp above (round-9 advice)
      .withColumn("top_decile_bp", when(col("revenue_cents") > 0L,
        expr(s"CAST((10000 * CAST(__top AS $dec))" +
          " DIV revenue_cents AS BIGINT)")))
      .withColumn("month", expr(
        "format_string('%04d-%02d', CAST(m DIV 12 AS INT)," +
          " CAST(m % 12 + 1 AS INT))"))
      .select(col("month"), col("n_customers"), col("revenue_cents"),
        col("gini_bp"), col("top_decile_bp"))
      .orderBy(col("month").asc)
  }
}
