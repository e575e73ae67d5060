package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.MortonCode

/** Physical data-layout planning — the multi-dimensional clustering
  * audit behind lakehouse OPTIMIZE/Z-ORDER decisions (Morton 1966;
  * the interleaved layout every engine with file-level min/max stats
  * exploits): how well would this table prune if laid out along the
  * Z-curve of two filter columns?
  *
  * [[zorderCells]] grids both dimensions, assigns each row its
  * Z-curve cell (the top `cellBits` bits of the interleaved code),
  * and reports per-cell row counts plus the min/max span of each RAW
  * dimension — a cell whose spans are ≪ the global range is a file
  * that both single-column filters can skip. That per-cell span table
  * IS the pruning model: expected scan fraction under a predicate on
  * either column is the sum of overlapping cells' row shares.
  *
  * Scale shape: one 4-scalar bounds aggregate (broadcast back via a
  * 1-row crossJoin, the house scalar pattern), then ONE map stage —
  * the codegen'd [[MortonCode]] is a handful of ALU ops per row — and
  * one cell-grain aggregate (≤ 2^cellBits groups). No sort, no
  * window, no shuffle beyond the tiny final grain: the audit costs
  * one pass regardless of table size. The LAYOUT itself (actually
  * rewriting files) is `df.repartitionByRange(N, morton)` +
  * sortWithinPartitions — sampled range boundaries, no global sort.
  */
object Layout {

  /** Per-Z-cell occupancy and raw-dimension spans.
    *
    * `gridBits` = resolution per dimension (positions are normalized
    * to [0, 2^gridBits) with BIGINT floor arithmetic — exact in any
    * engine for non-negative ranges < 2^(63−gridBits)). `cellBits` =
    * how many leading Morton bits define a cell (2^cellBits cells).
    * Columns: cell, n_rows, min_a, max_a, min_b, max_b, span_a_bp,
    * span_b_bp (cell span over global range, floor-bp). */
  def zorderCells(df: DataFrame, colA: String, colB: String,
      gridBits: Int = 16, cellBits: Int = 6): DataFrame = {
    require(gridBits >= 1 && gridBits <= 31, "gridBits in [1,31]")
    require(cellBits >= 1 && cellBits <= 2 * gridBits,
      "cellBits in [1, 2*gridBits]")
    val rows = df.select(col(colA).cast("long").as("a"),
        col(colB).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val bounds = rows.agg(
      min(col("a")).as("lo_a"), max(col("a")).as("hi_a"),
      min(col("b")).as("lo_b"), max(col("b")).as("hi_b"))
    val gmax = (1L << gridBits) - 1L
    def pos(c: String) =
      expr(s"(($c - lo_$c) * ${gmax}L) div greatest(hi_$c - lo_$c, 1L)")
    val shift = 2 * gridBits - cellBits
    rows.crossJoin(broadcast(bounds))
      .select(col("a"), col("b"),
        shiftright(MortonCode.morton(pos("a"), pos("b")), shift).as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .crossJoin(broadcast(bounds))
      .select(col("cell"), col("n_rows"),
        col("min_a"), col("max_a"), col("min_b"), col("max_b"),
        floor(lit(10000.0) * (col("max_a") - col("min_a")) /
          greatest(col("hi_a") - col("lo_a"), lit(1L))).cast("long")
          .as("span_a_bp"),
        floor(lit(10000.0) * (col("max_b") - col("min_b")) /
          greatest(col("hi_b") - col("lo_b"), lit(1L))).cast("long")
          .as("span_b_bp"))
      .orderBy(col("cell").asc)
  }

  /** Zone-map pruning audit: how much would file-level min/max stats
    * actually SKIP under this layout? [[zorderCells]] says how tight
    * the cells are; this op closes the loop by simulating the reader:
    * a declared family of `probes` equal-width range predicates per
    * dimension (the ceil-boundary partition of each global range — a
    * DECLARED domain, not whatever values happen to appear), and per
    * probe
    *  - scan_cells / scan_rows: cells whose [min,max] interval
    *    overlaps the probe — what a zone-map reader must touch;
    *  - select_rows: rows that actually match — the ideal scan.
    * scan_bp vs select_bp is the read-amplification the layout costs;
    * a perfect layout has them equal.
    *
    * Scale shape: the cell table (≤2^cellBits rows) is persisted and
    * reused for global bounds, totals, and the overlap test — all
    * cell-grain. The only row-grain work is ONE pass computing each
    * row's probe by ARITHMETIC (the ceil-partition inverse map — see
    * below; no per-row probe-list scan); nothing row-grain ever
    * shuffles beyond the (dim, probe)-grain count. Empty probes
    * (range narrower than the probe count) are dropped — their
    * overlap test is vacuous. */
  def pruningAudit(df: DataFrame, colA: String, colB: String,
      gridBits: Int = 16, cellBits: Int = 6, probes: Int = 16,
      cells0: Option[DataFrame] = None): DataFrame = {
    require(probes >= 1 && probes <= 1024, "probes in [1,1024]")
    // cells0 is the shared-model-artifact seam (the book0 pattern):
    // the cell table is the layout's index metadata — a caller that
    // also publishes it (q200) builds it once. Contract: cells0 is a
    // cell table of the zorderCells SCHEMA over the same rows —
    // zorderCells itself, or linearCells for the single-column-sort
    // layout (the audit machinery is layout-agnostic: it only reads
    // per-cell spans and occupancy).
    val cells = cells0.getOrElse(
      zorderCells(df, colA, colB, gridBits, cellBits).persist())
    // every row lives in a cell, so global bounds and the row total
    // are cell-grain aggregates — no second fact scan
    val glob = cells.agg(
      min(col("min_a")).as("lo_a"), max(col("max_a")).as("hi_a"),
      min(col("min_b")).as("lo_b"), max(col("max_b")).as("hi_b"),
      sum(col("n_rows")).as("total_rows"))
    val spark = df.sparkSession
    val p = probes.toLong
    def probeFor(d: String) = spark.range(p).toDF("probe")
      .crossJoin(broadcast(glob))
      .select(lit(d).as("dim"), col("probe"),
        expr(s"lo_$d + (probe * (hi_$d - lo_$d + 1L) + ${p - 1}L) div ${p}L")
          .as("c_lo"),
        expr(s"lo_$d + ((probe + 1L) * (hi_$d - lo_$d + 1L) + ${p - 1}L)" +
          s" div ${p}L - 1L").as("c_hi"),
        col("total_rows"))
    val probeFrame = probeFor("a").unionAll(probeFor("b"))
      .filter(col("c_hi") >= col("c_lo"))
    val scan = probeFrame
      .join(cells,
        (col("dim") === "a" && col("min_a") <= col("c_hi") &&
          col("max_a") >= col("c_lo")) ||
        (col("dim") === "b" && col("min_b") <= col("c_hi") &&
          col("max_b") >= col("c_lo")))
      .groupBy(col("dim"), col("probe"))
      .agg(count(lit(1)).as("scan_cells"), sum(col("n_rows")).as("scan_rows"))
    val rows = df.select(col(colA).cast("long").as("a"),
        col(colB).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    // row → probe is pure arithmetic, not a probe-list join: for the
    // ceil-boundary partition c_lo_i = lo + ⌈iW/P⌉, the inverse map
    // is exactly i = ((v − lo)·P) div W (x ≥ ⌈iW/P⌉ ⇒ Px ≥ iW, and
    // x < ⌈(i+1)W/P⌉ ⇒ Px < (i+1)W) — one codegen'd div per value
    // instead of a P-way nested-loop compare per row
    def probeOf(d: String) =
      expr(s"(($d - lo_$d) * ${p}L) div (hi_$d - lo_$d + 1L)")
    val sel = rows.crossJoin(broadcast(glob))
      .select(explode(array(
        struct(lit("a").as("dim"), probeOf("a").as("probe")),
        struct(lit("b").as("dim"), probeOf("b").as("probe")))).as("d"))
      .select(col("d.dim").as("dim"), col("d.probe").as("probe"))
      .groupBy(col("dim"), col("probe"))
      .agg(count(lit(1)).as("select_rows"))
    probeFrame
      .join(scan, Seq("dim", "probe"), "left")
      .join(sel, Seq("dim", "probe"), "left")
      .select(col("dim"), col("probe"), col("c_lo"), col("c_hi"),
        coalesce(col("scan_cells"), lit(0L)).as("scan_cells"),
        coalesce(col("scan_rows"), lit(0L)).as("scan_rows"),
        coalesce(col("select_rows"), lit(0L)).as("select_rows"),
        floor(lit(10000.0) * coalesce(col("scan_rows"), lit(0L)) /
          col("total_rows")).cast("long").as("scan_bp"),
        floor(lit(10000.0) * coalesce(col("select_rows"), lit(0L)) /
          col("total_rows")).cast("long").as("select_bp"))
      .orderBy(col("dim").asc, col("probe").asc)
  }

  /** Equal-width single-column cells — the "just ORDER BY a" layout's
    * zone-map model, in the [[zorderCells]] schema so [[pruningAudit]]
    * can audit either layout: cell = ⌊(a − lo)·2^cellBits / range⌋,
    * the file a range-partitioned single-column sort would land the
    * row in. Same one-pass shape as zorderCells (bounds aggregate
    * broadcast back, one map, one cell-grain aggregate). */
  def linearCells(df: DataFrame, colA: String, colB: String,
      cellBits: Int = 6): DataFrame = {
    require(cellBits >= 1 && cellBits <= 31, "cellBits in [1,31]")
    val rows = df.select(col(colA).cast("long").as("a"),
        col(colB).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val bounds = rows.agg(
      min(col("a")).as("lo_a"), max(col("a")).as("hi_a"),
      min(col("b")).as("lo_b"), max(col("b")).as("hi_b"))
    val c = 1L << cellBits
    rows.crossJoin(broadcast(bounds))
      .select(col("a"), col("b"),
        expr(s"((a - lo_a) * ${c}L) div (hi_a - lo_a + 1L)").as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .crossJoin(broadcast(bounds))
      .select(col("cell"), col("n_rows"),
        col("min_a"), col("max_a"), col("min_b"), col("max_b"),
        floor(lit(10000.0) * (col("max_a") - col("min_a")) /
          greatest(col("hi_a") - col("lo_a"), lit(1L))).cast("long")
          .as("span_a_bp"),
        floor(lit(10000.0) * (col("max_b") - col("min_b")) /
          greatest(col("hi_b") - col("lo_b"), lit(1L))).cast("long")
          .as("span_b_bp"))
      .orderBy(col("cell").asc)
  }

  /** Layout showdown — the OPTIMIZE decision table ("Z-ORDER BY
    * (a, b)" vs "ORDER BY a"): per zone-map probe, the scan fraction
    * each layout forces vs the ideal selection. The single-column
    * sort prunes its own dimension perfectly and the other one not at
    * all; Z-order pays a bounded premium on `a` to make `b` prunable
    * — this table shows exactly where the crossover sits for THIS
    * table's value distribution, instead of asserting the folklore.
    *
    * Scale shape: two [[pruningAudit]] passes (each one fact scan +
    * cell-grain work) joined at (dim, probe) grain — metadata. */
  def layoutCompare(df: DataFrame, colA: String, colB: String,
      gridBits: Int = 16, cellBits: Int = 6, probes: Int = 16,
      zcells0: Option[DataFrame] = None): DataFrame = {
    // Two pruningAudit calls each paid their own fact passes (the
    // linear cell build + one `sel` row pass PER audit = 4 scans
    // beyond the shared Z cells). Both audits share every row-grain
    // ingredient: the (a, b) projection, the global bounds (any
    // full cell partition yields the same min/max/total), the probe
    // frame, and the per-probe selected-row counts — only the
    // cell-grain overlap test differs by layout. Build each ONCE
    // (guide §2.4): one persisted fact pass total, and the audit
    // ladder runs at cell/probe grain for both layouts.
    val rows = df.select(col(colA).cast("long").as("a"),
        col(colB).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .persist()
    val zc = zcells0.getOrElse(
      zorderCells(rows, "a", "b", gridBits, cellBits).persist())
    val glob = zc.agg(
      min(col("min_a")).as("lo_a"), max(col("max_a")).as("hi_a"),
      min(col("min_b")).as("lo_b"), max(col("max_b")).as("hi_b"),
      sum(col("n_rows")).as("total_rows"))
    val c = 1L << cellBits
    // the single-column-sort cell model over the SAME persisted rows
    // and zc-derived bounds (linearCells standalone would rescan df
    // twice); only occupancy and the a-span matter to the audit
    val lc = rows.crossJoin(broadcast(glob))
      .select(col("a"), col("b"),
        expr(s"((a - lo_a) * ${c}L) div (hi_a - lo_a + 1L)").as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .persist()
    val spark = df.sparkSession
    val p = probes.toLong
    def probeFor(d: String) = spark.range(p).toDF("probe")
      .crossJoin(broadcast(glob))
      .select(lit(d).as("dim"), col("probe"),
        expr(s"lo_$d + (probe * (hi_$d - lo_$d + 1L) + ${p - 1}L) div ${p}L")
          .as("c_lo"),
        expr(s"lo_$d + ((probe + 1L) * (hi_$d - lo_$d + 1L) + ${p - 1}L)" +
          s" div ${p}L - 1L").as("c_hi"),
        col("total_rows"))
    val probeFrame = probeFor("a").unionAll(probeFor("b"))
      .filter(col("c_hi") >= col("c_lo"))
    def scanOf(cells: DataFrame, out: String) = probeFrame
      .join(cells,
        (col("dim") === "a" && col("min_a") <= col("c_hi") &&
          col("max_a") >= col("c_lo")) ||
        (col("dim") === "b" && col("min_b") <= col("c_hi") &&
          col("max_b") >= col("c_lo")))
      .groupBy(col("dim"), col("probe"))
      .agg(sum(col("n_rows")).as(out))
    def probeOf(d: String) =
      expr(s"(($d - lo_$d) * ${p}L) div (hi_$d - lo_$d + 1L)")
    val sel = rows.crossJoin(broadcast(glob))
      .select(explode(array(
        struct(lit("a").as("dim"), probeOf("a").as("probe")),
        struct(lit("b").as("dim"), probeOf("b").as("probe")))).as("d"))
      .select(col("d.dim").as("dim"), col("d.probe").as("probe"))
      .groupBy(col("dim"), col("probe"))
      .agg(count(lit(1)).as("select_rows"))
    probeFrame
      .join(scanOf(zc, "z_scan_rows"), Seq("dim", "probe"), "left")
      .join(scanOf(lc, "sort_scan_rows"), Seq("dim", "probe"), "left")
      .join(sel, Seq("dim", "probe"), "left")
      .select(col("dim"), col("probe"),
        floor(lit(10000.0) * coalesce(col("select_rows"), lit(0L)) /
          col("total_rows")).cast("long").as("select_bp"),
        floor(lit(10000.0) * coalesce(col("z_scan_rows"), lit(0L)) /
          col("total_rows")).cast("long").as("z_scan_bp"),
        floor(lit(10000.0) * coalesce(col("sort_scan_rows"), lit(0L)) /
          col("total_rows")).cast("long").as("sort_scan_bp"))
      .orderBy(col("dim").asc, col("probe").asc)
  }

  /** Bloom-filter pruning audit — the "should these files carry bloom
    * filters" decision table (Parquet row-group blooms): when the
    * layout sorts by `colA`, every file spans nearly the FULL range
    * of an uncorrelated `colB`, so zone maps can't prune point
    * lookups on `colB` at all — a per-file bloom prunes by MEMBERSHIP
    * instead, at the cost of `mBits` of metadata per file. Per point
    * probe (a deterministic md5-ordered draw of `probes` distinct
    * `colB` values): files passed by the zone map, by the bloom
    * (2 md5-derived hashes — no false negatives by construction, so
    * bloom ⊇ exact always), exactly containing the value, and the
    * bloom's false positives — the gap between the last two is what
    * the metadata spend buys.
    *
    * Scale shape: one fact pass to cell assignment (persisted —
    * caller-owned, the house cache convention) feeding three
    * cell-grain collapses: stats, the distinct (cell, bit) bloom set
    * (≤ cells·2·ndv rows — this IS the real bloom metadata footprint,
    * reported so the audit prices it honestly), and the distinct
    * (cell, value) set. Probes broadcast everywhere; no frame after
    * the first pass scales with row count. */
  def bloomPruningAudit(df: DataFrame, colA: String, colB: String,
      cellBits: Int = 6, mBits: Long = 131072L,
      probes: Int = 16): DataFrame = {
    require(cellBits >= 1 && cellBits <= 31, "cellBits in [1,31]")
    require(mBits >= 2L && mBits <= (1L << 20), "mBits in [2, 2^20]")
    require(probes >= 1 && probes <= 1024, "probes in [1,1024]")
    val rows = df.select(col(colA).cast("long").as("a"),
        col(colB).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val bounds = rows.agg(
      min(col("a")).as("lo_a"), max(col("a")).as("hi_a"))
    val c = 1L << cellBits
    val assigned = rows.crossJoin(broadcast(bounds))
      .select(expr(s"((a - lo_a) * ${c}L) div (hi_a - lo_a + 1L)")
        .as("cell"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // two 20-bit md5 hashes of the value (5 hex nibbles each), mod m
    def h(start: Int, column: String) = expr(
      s"CAST(conv(substring(md5(CAST($column AS STRING)), $start, 5)," +
        s" 16, 10) AS BIGINT) % ${mBits}L")
    val cellStats = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
    // probe draw rides the SAME persisted pass (one fact scan total)
    val probeVals = assigned.select(col("b")).distinct()
      .orderBy(expr("md5(CAST(b AS STRING))"), col("b")).limit(probes)
      .select(col("b").as("probe_b"), h(1, "b").as("pb1"),
        h(6, "b").as("pb2"))
      .withColumn("nb", when(col("pb1") === col("pb2"), 1L).otherwise(2L))
    val zone = cellStats.crossJoin(broadcast(probeVals))
      .groupBy(col("probe_b"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n_rows")).as("total_rows"),
        sum(when(col("min_b") <= col("probe_b") &&
          col("max_b") >= col("probe_b"), 1L).otherwise(0L)).as("zone_cells"),
        sum(when(col("min_b") <= col("probe_b") &&
          col("max_b") >= col("probe_b"), col("n_rows")).otherwise(0L))
          .as("zone_rows"))
    // The audit never needs the cell×bit bloom SET (≈2·N rows through
    // an explode+distinct shuffle — it was this query's whole shuffle
    // volume); only membership of the ≤2·probes broadcast probe bits
    // matters. Filter each fact row's two bits against that broadcast
    // set first — survivors are ~(2·probes/mBits)·N rows — and count
    // DISTINCT matched bits per (probe, cell) afterwards, which is
    // exactly what the old count-over-deduped-bits computed
    // (guide §2.3: shuffle the decision metadata, not the set).
    // the probe table exploded to (probe, bit) rows makes this a
    // broadcast HASH join on `bit` (the pb1/pb2 OR-form was a
    // nested-loop over every row-bit × every probe)
    val probeBits = probeVals
      .select(col("probe_b"), col("nb"),
        explode(array(col("pb1"), col("pb2"))).as("bit"))
      .distinct()
    val bloom = assigned
      .select(col("cell"), explode(array(h(1, "b"), h(6, "b"))).as("bit"))
      .join(broadcast(probeBits), Seq("bit"))
      .groupBy(col("probe_b"), col("cell"), col("nb"))
      .agg(countDistinct(col("bit")).as("__matched"))
      .filter(col("__matched") === col("nb"))
      .join(cellStats, Seq("cell"))
      .groupBy(col("probe_b"))
      .agg(count(lit(1)).as("bloom_cells"),
        sum(col("n_rows")).as("bloom_rows"))
    // exact membership likewise: broadcast-semi against the probe
    // values, then count distinct containing cells — the former
    // distinct (cell, value) set frame never exists
    val exact = assigned.join(broadcast(probeVals),
        col("b") === col("probe_b"))
      .groupBy(col("probe_b"))
      .agg(countDistinct(col("cell")).as("exact_cells"))
    zone
      .join(bloom, Seq("probe_b"), "left")
      .join(exact, Seq("probe_b"), "left")
      .select(col("probe_b"), col("n_cells"), col("zone_cells"),
        col("zone_rows"),
        coalesce(col("bloom_cells"), lit(0L)).as("bloom_cells"),
        coalesce(col("bloom_rows"), lit(0L)).as("bloom_rows"),
        coalesce(col("exact_cells"), lit(0L)).as("exact_cells"),
        (coalesce(col("bloom_cells"), lit(0L)) -
          coalesce(col("exact_cells"), lit(0L))).as("fp_cells"),
        floor(lit(10000.0) * col("zone_rows") / col("total_rows"))
          .cast("long").as("zone_bp"),
        floor(lit(10000.0) * coalesce(col("bloom_rows"), lit(0L)) /
          col("total_rows")).cast("long").as("bloom_bp"))
      .orderBy(col("probe_b").asc)
  }
}
