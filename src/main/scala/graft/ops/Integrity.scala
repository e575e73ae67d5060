package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the orphan-row report every
  * lakehouse runs before trusting a join: for each declared FK edge,
  * how many child rows (and distinct keys) reference a parent that
  * does not exist. A 2% orphan rate silently deletes 2% of revenue
  * from every inner join downstream; this report is where that is
  * caught. NULL FKs are counted separately (`n_null_rows`) — a NULL
  * is "no reference", not a broken one, and lumping the two hides
  * which producer is at fault.
  *
  * Scale shape, per edge: the child collapses to FK-KEY grain in one
  * aggregate (partial map-side — the shuffle carries keyed counts,
  * never rows), then LEFT-joins the parent's distinct key set at key
  * grain; orphan rows are summed from the carried counts. The parent
  * side is its key domain, not its table width. Edges are unioned at
  * report grain (one row each).
  */
object Integrity {

  /** One FK edge: child frame + FK column → parent frame + PK column,
    * labeled `edge`. */
  final case class Edge(edge: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String)

  def refIntegrity(edges: Seq[Edge]): DataFrame = {
    require(edges.nonEmpty, "declare at least one FK edge")
    require(edges.map(_.edge).distinct.size == edges.size,
      s"edge labels must be distinct: ${edges.map(_.edge)}")
    edges.map { e =>
      val childKeys = e.child
        .groupBy(col(e.fk).as("__k"))
        .agg(count(lit(1)).as("__rows"))
      val parentKeys = e.parent.select(col(e.pk).as("__k")).distinct()
        .withColumn("__p", lit(1L))
      childKeys
        .join(parentKeys, Seq("__k"), "left")
        .agg(
          sum(col("__rows")).as("n_rows"),
          count(when(col("__k").isNotNull, 1L)).as("n_keys"),
          coalesce(sum(when(col("__k").isNull, col("__rows"))), lit(0L))
            .as("n_null_rows"),
          coalesce(sum(when(col("__k").isNotNull && col("__p").isNull,
            lit(1L))), lit(0L)).as("n_orphan_keys"),
          coalesce(sum(when(col("__k").isNotNull && col("__p").isNull,
            col("__rows"))), lit(0L)).as("n_orphan_rows"))
        .select(lit(e.edge).as("edge"), col("n_rows"), col("n_keys"),
          col("n_null_rows"), col("n_orphan_keys"), col("n_orphan_rows"),
          floor(lit(10000.0) * col("n_orphan_rows") / col("n_rows"))
            .cast("long").as("orphan_bp"))
    }.reduce(_ unionByName _)
  }

  /** Join fan-out forecast — the pre-flight audit before a big join
    * ships: collapse BOTH sides to key grain, and from the keyed
    * counts alone predict the join's exact output cardinality
    * (Σ cl·cr over matched keys) and its hottest key (the straggler
    * task AQE will have to split). A 10¹²-row surprise is caught here
    * for the cost of two key-grain aggregates, not discovered at hour
    * three of the join itself. NULL join keys never match — their
    * rows are visible in the side totals but predict nothing.
    *
    * Determinism: the fan-out sum is an exact decimal(38,0) aggregate
    * (cl·cr alone can reach 10¹⁸ — BIGINT-edge — and the SUM far
    * past it); the hot key breaks product ties by largest key, pinned
    * on both engines. Output is ONE row; the hot-key columns are NULL
    * when no key matches (left join of the 1-row report against the
    * possibly-empty top-1).
    *
    * Scale shape: one shuffle per side to key grain (partial
    * map-side), a key-grain join, a 1-row aggregate, and a
    * TakeOrderedAndProject top-1 — the joined key frame is persisted
    * so the two consumers share one build. */
  def joinFanout(left: DataFrame, lk: String,
      right: DataFrame, rk: String): DataFrame = {
    val lc = left.groupBy(col(lk).as("__lk"))
      .agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rk).as("__rk"))
      .agg(count(lit(1)).as("cr"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val j = lc
      .join(rc, col("__lk") === col("__rk"), "full_outer")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val matched = col("cl").isNotNull && col("cr").isNotNull
    val report = j.agg(
      coalesce(sum(col("cl")), lit(0L)).as("n_left_rows"),
      coalesce(sum(col("cr")), lit(0L)).as("n_right_rows"),
      count(when(col("cl").isNotNull && col("__lk").isNotNull, 1L))
        .as("n_left_keys"),
      count(when(col("cr").isNotNull && col("__rk").isNotNull, 1L))
        .as("n_right_keys"),
      count(when(matched, 1L)).as("n_matched_keys"),
      coalesce(sum(when(matched, dec(col("cl")) * dec(col("cr")))),
        lit(0L).cast("decimal(38,0)")).as("predicted_rows"))
    val hot = j
      .filter(matched)
      // decimal, like the sum: a BIGINT cl·cr wraps silently past
      // 2^63 (wrong hot key, negative fan-out) where DuckDB raises
      .withColumn("__fan", dec(col("cl")) * dec(col("cr")))
      .orderBy(col("__fan").desc, col("__lk").desc)
      .limit(1)
      .select(col("__lk").cast("string").as("hot_key"),
        col("__fan").cast("string").as("hot_fanout"))
    report.join(hot, lit(true), "left")
      .select(col("n_left_rows"), col("n_right_rows"),
        col("n_left_keys"), col("n_right_keys"), col("n_matched_keys"),
        col("predicted_rows").cast("string").as("predicted_rows"),
        col("hot_key"), col("hot_fanout"))
  }

  /** The user-grain conversion frame [[timeToConvert]] reports over
    * (and the batch-parity surface for the live twin,
    * [[graft.streaming.ConvertStream]]): per user, the first
    * `fromType` timestamp and the delay to the first `toType` event
    * AT-OR-AFTER it — a toType before the user's first fromType is
    * NOT a conversion of this funnel edge, and must not hide a later
    * one; hence the unordered min window (which the user-grain
    * aggregate's partitioning then reuses — one fact shuffle). */
  def conversionDelays(events: DataFrame, fromType: String,
      toType: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val wUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    events
      .filter(col("ts").isNotNull)
      .withColumn("t_from",
        min(when(col("event_type") === fromType, us)).over(wUser))
      .groupBy(col("user_id"))
      .agg(min(col("t_from")).as("t_from"),
        min(when(col("event_type") === toType && us >= col("t_from"), us))
          .as("t_to"))
      .withColumn("delay_s",
        when(col("t_to").isNotNull, expr("(t_to - t_from) div 1000000")))
  }

  /** Time-to-convert report — the latency profile of a funnel edge:
    * per user, the delay from their FIRST `fromType` event to their
    * FIRST `toType` event at-or-after it; report = conversion counts
    * plus exact nearest-rank quantiles of the delay (house lower
    * quantile, integer seconds). The p90 here is the number that
    * decides an attribution window or a retargeting deadline.
    *
    * Scale shape: the per-user "first fromType" is an unordered MIN
    * window over user_id, and the user-grain aggregate right after it
    * REUSES that window's partitioning (the q02/q06 subset-clustering
    * trick) — one fact shuffle total, no self-join of two filtered
    * scans. Converted users then collapse to DELAY-SECONDS grain for
    * the quantile histogram (q77's value-grain plan: the rank window
    * runs over distinct delays, never users). One row per rank. */
  def timeToConvert(events: DataFrame, fromType: String = "click",
      toType: String = "purchase",
      ranksBp: Seq[Long] = Seq(5000L, 9000L, 9900L)): DataFrame = {
    val grain = conversionDelays(events, fromType, toType)
      // two consumers below (funnel totals + delay histogram) — the
      // persist keeps the fact chain to ONE corpus pass
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val funnel = grain.agg(
      count(when(col("t_from").isNotNull, 1L)).as("n_from_users"),
      count(col("delay_s")).as("n_converted"))
    // rank arithmetic + guards live in Percentiles.valueQuantiles
    // (shared with winsorizedLift's cap) — one site to keep in sync
    Percentiles.valueQuantiles(grain, "delay_s", ranksBp)
      .crossJoin(broadcast(funnel))
      .select(col("n_from_users"), col("n_converted"),
        explode(array(ranksBp.map { p =>
          struct(lit(p).as("rank_bp"), col(s"__q$p").as("delay_s"))
        }: _*)).as("q"))
      .select(col("q.rank_bp").as("rank_bp"),
        col("q.delay_s").as("delay_s"),
        col("n_from_users"), col("n_converted"))
  }

  /** Join-key balance audit — [[joinFanout]] predicts a join's output
    * volume; this report predicts its PARALLELISM. The inverse-Simpson
    * "effective key count" eff = N² / Σ c_k² is the number of
    * equally-loaded keys that would produce the same collision mass:
    * eff ≈ n_keys means a flat key (shuffle partitions balance);
    * eff ≪ n_keys means the shuffle is secretly a few straggler
    * tasks, whatever the distinct count claims. `balance_bp` =
    * ⌊10000·eff/n_keys⌋ is the planner's one-glance number (10000 =
    * perfectly flat). The complement of q137's hot-key TOP-N view:
    * keySkew names the villains, keyBalance scores the whole
    * distribution in one scalar.
    *
    * Determinism at 100 TB: Σ c² is an exact decimal(38,0) aggregate
    * (a 3·10⁹-row key alone puts c² past BIGINT — Spark would wrap
    * silently, DuckDB would raise; the q155 precedent) and ships as a
    * digit string; the eff ratio runs in DOUBLE with the expression
    * tree mirrored textually in the oracle (IEEE determinism — the
    * volumeAnomaly convention).
    *
    * Scale shape, per side: one key-grain shuffle (partial map-side)
    * collapsing the table to keyed counts, then a 1-row aggregate;
    * sides union at report grain. NULL keys are excluded — they
    * never match a join anyway. */
  def keyBalance(sides: Seq[(String, DataFrame, String)]): DataFrame = {
    require(sides.nonEmpty, "declare at least one (label, frame, key) side")
    require(sides.map(_._1).distinct.size == sides.size,
      s"side labels must be distinct: ${sides.map(_._1)}")
    sides.map { case (label, df, key) =>
      val d18 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
      df.filter(col(key).isNotNull)
        .groupBy(col(key).as("__k"))
        .agg(count(lit(1)).as("c"))
        .agg(
          coalesce(sum(col("c")), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(max(col("c")), lit(0L)).as("max_key_rows"),
          sum(d18(col("c")) * d18(col("c"))).as("__sumsq"))
        .select(
          lit(label).as("side"), col("n_rows"), col("n_keys"),
          col("max_key_rows"),
          coalesce(col("__sumsq").cast("string"), lit("0")).as("sum_sq"),
          when(coalesce(col("__sumsq"), lit(0).cast("decimal(38,0)"))
              === lit(0).cast("decimal(38,0)"), 0L)
            .otherwise(floor(col("n_rows").cast("double") *
              col("n_rows").cast("double") / col("__sumsq").cast("double"))
              .cast("long")).as("eff_keys"))
        .withColumn("balance_bp",
          when(col("n_keys") === 0L, 0L)
            .otherwise(floor(lit(10000.0) * col("eff_keys") / col("n_keys"))
              .cast("long")))
    }.reduce(_ unionByName _)
  }

  /** Ledger reconciliation: does the order header's total agree with
    * the sum of its lines? The money twin of [[refIntegrity]] — FK
    * orphans break joins, header/detail drift breaks REVENUE, and
    * both are producer bugs a pipeline must surface before anyone
    * aggregates the numbers. One row: order counts by agreement class
    * (exact / within `toleranceBp` of the header / headless) and the
    * p50/p90/p99 of the absolute delta — the "how wrong" panel that
    * tells a rounding bug (deltas of a few cents) from a lost-lines
    * bug (deltas the size of the order).
    *
    * Money is exact BIGINT cents end-to-end (per-row floor×100, the
    * q136 convention); the delta quantiles use the house exact
    * value-histogram nearest-rank (window over DISTINCT deltas, never
    * rows). Orders with no lineitems are counted apart (`n_no_lines`)
    * and excluded from the delta panel — "no detail" is a different
    * defect than "wrong detail".
    *
    * Scale shape: one lineitem shuffle to order grain (map-side
    * combined), an order-grain join, then the delta frame collapses
    * to delta-value grain for the quantile window; the report is one
    * row. */
  def orderReconciliation(orders: DataFrame, lineitem: DataFrame,
      toleranceBp: Long = 100L): DataFrame = {
    require(toleranceBp >= 0L, "toleranceBp must be >= 0")
    val lc = lineitem
      .select(col("l_orderkey"), expr(
        """CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
          |  * (1.0 + l_tax) * 100.0) AS BIGINT)""".stripMargin).as("c"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("c")).as("line_cents"))
    val d = orders
      .select(col("o_orderkey"),
        expr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)").as("total_cents"))
      .join(lc, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("total_cents"), col("line_cents"),
        col("line_cents").isNull.as("no_lines"),
        abs(col("total_cents") - coalesce(col("line_cents"), lit(0L)))
          .as("abs_delta"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = d.agg(
      count(lit(1)).as("n_orders"),
      sum(when(col("no_lines"), 1L).otherwise(0L)).as("n_no_lines"),
      sum(when(!col("no_lines") && col("abs_delta") === 0L, 1L).otherwise(0L))
        .as("n_exact"),
      sum(when(!col("no_lines") &&
          col("abs_delta") * 10000L <= col("total_cents") * toleranceBp,
        1L).otherwise(0L)).as("n_within_tol"))
      .withColumn("within_tol_bp",
        when(col("n_orders") === col("n_no_lines"), 0L)
          .otherwise(floor(lit(10000.0) * col("n_within_tol") /
            (col("n_orders") - col("n_no_lines"))).cast("long")))
    // exact nearest-rank deltas over the distinct-delta histogram
    val w = org.apache.spark.sql.expressions.Window
    val hist = d.filter(!col("no_lines"))
      .groupBy(col("abs_delta")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        w.partitionBy().orderBy(col("abs_delta").asc)))
      .withColumn("n", sum(col("cnt")).over(w.partitionBy()))
    val picks = Seq(5000L, 9000L, 9900L).map { p =>
      min(when(col("cum") >= expr(s"(n * $p + 9999) div 10000"),
        col("abs_delta"))).as(s"p${p / 100}_delta_cents")
    }
    stats.join(hist.agg(picks.head, picks.tail: _*), lit(true), "left")
  }

  /** Duplicate-ORDER audit — the double-payment tripwire. Candidate
    * grain is (customer, order day): several same-day orders from one
    * customer are re-submission CANDIDATES; identical amounts inside
    * such a group (distinct cents < size) are the strict exact-dupe
    * signal, and `exposed_cents` totals the repeated amounts a
    * payment run would double-charge. Reported at multiplicity grain
    * (never the group list — the k-anonymity disclosure rule):
    * size, n_groups, n_orders, n_exact_groups, exposed_cents. One
    * fact pass → two bounded aggregates. */
  def duplicateOrders(orders: DataFrame): DataFrame =
    orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      // amount grain first: (n−1)·cents per repeated amount is the
      // exposed mass, and the distinct-amount count falls out free
      .groupBy(col("o_custkey"), col("day"), col("cents"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("o_custkey"), col("day"))
      .agg(sum(col("n")).as("size"), count(lit(1)).as("nd"),
        sum((col("n") - 1L) * col("cents")).as("exposed"))
      .filter(col("size") >= 2L)
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("size")).as("n_orders"),
        sum(when(col("nd") < col("size"), 1L).otherwise(0L))
          .as("n_exact_groups"),
        sum(col("exposed")).as("exposed_cents"))
      .orderBy(col("size").asc)

  /** Line-number contiguity audit: every order's l_linenumber should
    * be exactly 1..n. One order-grain aggregate classifies each
    * order — `dup` (distinct < count: repeated numbers), else `gap`
    * (max ≠ count: holes or offset starts), else ok — and one
    * summary row reports the counts. The cheap structural check
    * before anyone trusts per-line joins at 100 TB. */
  def linenumberAudit(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_linenumber")).as("nd"),
        max(col("l_linenumber")).cast("long").as("mx"),
        min(col("l_linenumber")).cast("long").as("mn"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("nd") < col("n"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("nd") === col("n") &&
          (col("mx") =!= col("n") || col("mn") =!= 1L), 1L)
          .otherwise(0L)).as("n_gap"))
      .select(col("n_orders"), col("n_dup"), col("n_gap"),
        (col("n_orders") - col("n_dup") - col("n_gap")).as("n_ok"))

  /** Zero-sales-day audit: per part, how much of its own active span
    * (first to last sale day) had NO sales at all — the stock-out /
    * delisting signal a demand forecast must not train through.
    * Parts below `minSpanDays` are noise and gated out; top `k` by
    * zero-share (partkey tie-break). One fact pass to part grain:
    * span and distinct-day counts are the whole computation. */
  def zeroSalesDays(lineitem: DataFrame, minSpanDays: Long = 30L,
      k: Int = 20): DataFrame =
    lineitem
      .select(col("l_partkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("day"))
      .groupBy(col("l_partkey"))
      .agg((max(col("day")) - min(col("day")) + 1L).as("span_days"),
        countDistinct(col("day")).as("sale_days"))
      .filter(col("span_days") >= minSpanDays)
      .select(col("l_partkey"), col("span_days"), col("sale_days"),
        (col("span_days") - col("sale_days")).as("zero_days"),
        floor(lit(10000.0) * (col("span_days") - col("sale_days")) /
          col("span_days")).cast("long").as("zero_bp"))
      .orderBy(col("zero_bp").desc, col("l_partkey").asc)
      .limit(k)

  /** Duplicate-provenance MATRIX — which source copies which: the
    * diagonal counts texts duplicated WITHIN a source (always
    * emitted, 0 = provably clean — the observed source set is the
    * declared domain), off-diagonal cells count exact texts SHARED
    * by two sources. Together they say where a mixture's dedup
    * budget actually goes (crawl↔crawl churn vs curated leaking
    * into crawl). Collapses to (text hash, source) grain FIRST, so
    * the pair join is bounded by the source count per hash
    * (≤ |sources|), never by replica multiplicity — the q42
    * representative-grain discipline. */
  def crossSourceDups(docs: DataFrame): DataFrame = {
    val hs = docs.filter(col("text").isNotNull)
      .select(md5(col("text")).as("h"), col("source"))
      .groupBy(col("h"), col("source"))
      .agg(count(lit(1)).as("n"))
      .persist() // diagonal, cross pairs, and the source domain
    val within = hs.groupBy(col("source"))
      .agg(sum(when(col("n") >= 2L, 1L).otherwise(0L)).as("n_shared_texts"))
      .select(col("source").as("source_a"), col("source").as("source_b"),
        col("n_shared_texts"))
    val cross = hs.as("x").join(hs.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_texts"))
    within.unionAll(cross)
      .orderBy(col("n_shared_texts").desc, col("source_a").asc,
        col("source_b").asc)
  }

  /** Unit-price DISPERSION audit: parts whose observed unit price
    * (extendedprice/quantity, cents) spreads widest — pricing errors,
    * unit mismatches, or genuine discrimination surface here. Per
    * part with ≥ `minLines` lines: line count, min/max unit cents,
    * spread_bp = (max−min)/max. Top `k` by spread (partkey
    * tie-break). One fact pass → part grain → TakeOrdered head. */
  def priceDispersion(lineitem: DataFrame, minLines: Long = 3L,
      k: Int = 20): DataFrame =
    lineitem
      .filter(col("l_quantity") > lit(0.0))
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * lit(100.0) / col("l_quantity"))
          .cast("long").as("unit_cents"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        min(col("unit_cents")).as("min_cents"),
        max(col("unit_cents")).as("max_cents"))
      .filter(col("n_lines") >= minLines && col("max_cents") > 0L)
      .withColumn("spread_bp",
        floor(lit(10000.0) * (col("max_cents") - col("min_cents")) /
          col("max_cents")).cast("long"))
      .orderBy(col("spread_bp").desc, col("l_partkey").asc)
      .limit(k)

  /** Price-ending census — the rounding-artifact forensic next to
    * [[benfordAudit]]'s first-digit screen: the distribution of the
    * CENT ending (price mod 1 dollar). Human-set prices pile on
    * .00/.99/.50 (psychological points); machine-generated or
    * synthetic prices are near-uniform over the 100 endings — a
    * sudden spike at one ending is a currency-conversion or
    * double-rounding bug surfacing in the fact stream.
    *
    * Top `k` endings by count (count desc, ending asc) plus one
    * `rest` rollup so the shares close over the whole table;
    * excess_bp = share − 100bp (the uniform expectation per ending,
    * scaled by the rest row's ending count).
    *
    * Scale shape: one scan to a ≤100-row ending histogram
    * (map-side combined); the head pick and shares are metadata.
    *
    * Columns: ending ('00'…'99' or 'rest'), n_prices, share_bp,
    * expected_bp, excess_bp. */
  def priceEndings(lineitem: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 100, "k in [1,100]")
    val hist = lineitem
      .filter(col("l_extendedprice").isNotNull)
      .groupBy(pmod(floor(col("l_extendedprice") * lit(100.0))
        .cast("long"), lit(100L)).as("e"))
      .agg(count(lit(1)).as("n_prices"))
    val wPick = Window.orderBy(col("n_prices").desc, col("e").asc)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("rk", row_number().over(wPick))
      .withColumn("ending",
        when(col("rk") <= k, format_string("%02d", col("e")))
          .otherwise(lit("rest")))
      .groupBy(col("ending"))
      .agg(sum(col("n_prices")).as("n_prices"),
        count(lit(1)).as("__n_endings"))
      .withColumn("__tot", sum(col("n_prices")).over(wAll))
      .withColumn("share_bp", expr("(10000 * n_prices) DIV __tot"))
      .withColumn("expected_bp", lit(100L) * col("__n_endings"))
      .withColumn("excess_bp", col("share_bp") - col("expected_bp"))
      .select(col("ending"), col("n_prices"), col("share_bp"),
        col("expected_bp"), col("excess_bp"))
      .orderBy(col("n_prices").desc, col("ending").asc)
  }
}
