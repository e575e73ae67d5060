package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation analytics over the event stream: deterministic
  * hash-bucket arm assignment (the house md5-draw convention — the
  * same user lands in the same arm on every run and every cluster
  * layout, which IS how production bucketing works), the
  * sample-ratio-mismatch health check every experiment platform runs
  * before reading any metric, and the per-arm conversion lift table.
  *
  * Both reports collapse to ARM grain (≤ a handful of rows) in one
  * user-grain pass; no libm (deviations are integer bp compares).
  */
object Experiment {

  /** Deterministic arm for a user id: md5-draw mod 100 < splitPct →
    * "A" else "B" (the q81/q107 draw convention at the user key).
    * Shared with [[graft.streaming.SrmStream]] — the live monitor must
    * bucket EXACTLY like the batch check or parity is meaningless. */
  private[graft] def armCol(userCol: String, splitPct: Int): Column =
    when(expr(s"CAST(conv(substring(md5(CAST($userCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
      < splitPct, lit("A")).otherwise(lit("B"))

  /** Sample-ratio-mismatch check: observed vs declared arm shares
    * over DISTINCT users (events-per-user must not bias the ratio),
    * deviation in bp, and a flag when it exceeds `toleranceBp` — the
    * stop-the-experiment signal (an SRM means assignment or logging
    * is broken; metrics read from it are garbage). */
  def srmCheck(events: DataFrame, splitPct: Int = 50,
      toleranceBp: Long = 300L): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val wAll = Window.partitionBy()
    events
      .select(col("user_id")).distinct()
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("expected_bp",
        when(col("arm") === "A", lit(splitPct * 100L))
          .otherwise(lit((100 - splitPct) * 100L)))
      .withColumn("observed_bp",
        floor(lit(10000.0) * col("n_users") /
          sum(col("n_users")).over(wAll)).cast("long"))
      .withColumn("dev_bp", abs(col("observed_bp") - col("expected_bp")))
      .withColumn("srm_flag", (col("dev_bp") > toleranceBp).cast("int"))
  }

  /** Per-arm conversion report: users, converters (≥1 `convType`
    * event), conversion rate, and each arm's delta vs the pooled
    * rate (integer bp; the reader derives A−B from two rows — the
    * report stays arm-grain so k-arm experiments need no schema
    * change). */
  def abLift(events: DataFrame, splitPct: Int = 50,
      convType: String = "purchase"): DataFrame = {
    val wAll = Window.partitionBy()
    events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("converted"))
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_bp",
        floor(lit(10000.0) * col("n_converted") / col("n_users")).cast("long"))
      .withColumn("pooled_bp",
        floor(lit(10000.0) * sum(col("n_converted")).over(wAll) /
          sum(col("n_users")).over(wAll)).cast("long"))
      .withColumn("delta_bp", col("conv_bp") - col("pooled_bp"))
  }

  /** CUPED variance-reduced lift (Deng et al., WSDM 2013 — "Improving
    * the Sensitivity of Online Controlled Experiments by Utilizing
    * Pre-Experiment Data"): per-arm mean of the post-period metric
    * adjusted by each user's PRE-period metric, ŷ = y − θ(x − x̄),
    * with θ = cov(x,y)/var(x) fit on the pooled users. The adjustment
    * removes the between-user variance the pre-period predicts, which
    * is what lets a real platform call experiments days earlier; the
    * arm DELTA is unbiased because assignment is independent of x.
    *
    * Determinism contract (cross-engine hash parity): per-user metrics
    * are integer cents; every moment (Σx, Σy, Σxy, Σx²) is an EXACT
    * decimal(38,0) sum — order-independent, overflow-safe past any
    * BIGINT cents product — and only the final θ/mean arithmetic runs
    * in double, with one pinned expression shape mirrored in the
    * oracle SQL. Σ of doubles would be partition-order-dependent and
    * can never hash-match.
    *
    * Scale shape: ONE fact shuffle (user-grain aggregate, partial
    * map-side) → arm-grain aggregate (2 rows, map-side partials) →
    * pooled moments as window sums over the 2 arm rows. No persist,
    * no second corpus pass. */
  def cupedLift(events: DataFrame, splitDate: String, splitPct: Int = 50,
      metricType: String = "purchase"): DataFrame = {
    val wAll = Window.partitionBy()
    val cents = floor(col("value") * lit(100.0)).cast("long")
    val isMetric = col("event_type") === metricType && col("value").isNotNull
    val pre = when(isMetric && col("ts") < to_timestamp(lit(splitDate)), cents)
    val post = when(isMetric && col("ts") >= to_timestamp(lit(splitDate)), cents)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val arms = events
      .groupBy(col("user_id"))
      .agg(coalesce(sum(pre), lit(0L)).as("x"),
        coalesce(sum(post), lit(0L)).as("y"))
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"))
    // pooled moments over the ≤2 arm rows, all still exact integers
    val (n, sx, sy, sxy, sxx) = (
      sum(col("n_users")).over(wAll).cast("double"),
      sum(col("sx")).over(wAll).cast("double"),
      sum(col("sy")).over(wAll).cast("double"),
      sum(col("sxy")).over(wAll).cast("double"),
      sum(col("sxx")).over(wAll).cast("double"))
    // θ = (NΣxy − ΣxΣy)/(NΣx² − (Σx)²); a constant pre-period
    // (denominator 0) means nothing to adjust — θ = 0
    val den = n * sxx - sx * sx
    val theta = when(den === 0.0, lit(0.0)).otherwise((n * sxy - sx * sy) / den)
    val xbar = sx / n
    arms
      .withColumn("__theta", theta)
      .withColumn("__xbar", xbar)
      .withColumn("raw_mean_cents",
        floor(col("sy").cast("double") / col("n_users")).cast("long"))
      .withColumn("adj_mean_cents",
        floor((col("sy").cast("double") - col("__theta") *
          (col("sx").cast("double") - col("n_users") * col("__xbar"))) /
          col("n_users")).cast("long"))
      .withColumn("theta_bp", floor(lit(10000.0) * col("__theta")).cast("long"))
      .select(col("arm"), col("n_users"), col("raw_mean_cents"),
        col("adj_mean_cents"), col("theta_bp"))
  }

  /** Post-stratified lift — the classic variance-reduction
    * alternative to [[cupedLift]] (stratify instead of regress): user
    * spend compared between arms WITHIN activity strata, then the
    * per-stratum differences recombined with population weights. Where
    * CUPED needs a linear pre-metric relationship, stratification only
    * needs the covariate to be prognostic — and the per-stratum rows
    * themselves are the heterogeneity read ("the lift lives in the
    * low-activity tier").
    *
    * Strata are equi-depth bins of the user's NON-metric event count
    * at VALUE grain (the q203 last-rank rule — tied activity lands
    * whole in one bin). Strata missing an arm are excluded from the
    * recombination and the weights renormalize over covered strata
    * (standard off-support handling). Arithmetic: per-stratum milli
    * means by integral DIV (exact, deterministic; floor dust ≤1 milli
    * per stratum is the q315 micro-floor trade), the weighted
    * recombination an exact integer sum with one terminal DIV.
    *
    * Scale shape: one fact pass to user grain (persisted); the
    * stratum map is value-grain broadcast metadata; cells, the
    * recombination, and the report are ≤nStrata+1 rows.
    *
    * Columns: stratum (0 = ALL), n_a, n_b, mean_a_milli,
    * mean_b_milli, diff_milli (naive on the ALL row), weight_bp,
    * post_strat_diff_milli (ALL row only). */
  def postStratifiedLift(events: DataFrame, splitPct: Int = 50,
      metricType: String = "purchase", nStrata: Int = 4): DataFrame = {
    require(nStrata >= 2, "nStrata must be >= 2")
    val cents = floor(col("value") * lit(100.0)).cast("long")
    val isMetric = col("event_type") === metricType && col("value").isNotNull
    val users = events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") =!= metricType, 1L).otherwise(0L))
        .as("act"),
        coalesce(sum(when(isMetric, cents)), lit(0L)).as("y"))
      .withColumn("arm", armCol("user_id", splitPct))
      .persist()
    val strata = users.groupBy(col("act")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("act").asc)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .select(col("act"), expr(s"(cum - 1L) * ${nStrata}L div n + 1L")
        .as("stratum"))
    def cellAggs(df: DataFrame, key: Column) = df
      .groupBy(key.as("stratum"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        coalesce(sum(when(col("arm") === "A", col("y"))), lit(0L))
          .as("sy_a"),
        coalesce(sum(when(col("arm") === "B", col("y"))), lit(0L))
          .as("sy_b"))
      .withColumn("mean_a_milli",
        when(col("n_a") > 0L, expr("(1000 * sy_a) DIV n_a")))
      .withColumn("mean_b_milli",
        when(col("n_b") > 0L, expr("(1000 * sy_b) DIV n_b")))
      .withColumn("diff_milli", col("mean_a_milli") - col("mean_b_milli"))
    val cells = cellAggs(users.join(broadcast(strata), Seq("act")),
      col("stratum")).localCheckpoint(false)
    val nTot = cells.agg(sum(col("n_a") + col("n_b")).as("n_all"))
    val recomb = cells
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .agg(sum(col("n_a") + col("n_b")).as("ncov"),
        sum((col("n_a") + col("n_b")) * col("diff_milli")).as("wsum"))
      .select(when(col("ncov") > 0L, expr("wsum DIV ncov"))
        .as("post_strat_diff_milli"))
    val allRow = cellAggs(users, lit(0L))
      .crossJoin(broadcast(recomb))
    val stratumRows = cells
      .withColumn("post_strat_diff_milli", lit(null).cast("long"))
    stratumRows.unionByName(allRow)
      .crossJoin(broadcast(nTot))
      .select(col("stratum"), col("n_a"), col("n_b"),
        col("mean_a_milli"), col("mean_b_milli"), col("diff_milli"),
        when(col("n_all") > 0L,
          expr("(10000 * (n_a + n_b)) DIV n_all")).as("weight_bp"),
        col("post_strat_diff_milli"))
      .orderBy(col("stratum").asc)
  }

  /** Winsorized lift — per-arm means of the user metric CAPPED at its
    * pooled exact `pBp` quantile (nearest-rank, the house lower
    * quantile): the robust revenue readout every experiment platform
    * publishes beside the raw mean, because one whale in one arm can
    * otherwise flip the sign of a raw delta. The cap is fit on the
    * pooled users (assignment-independent, so capping is unbiased
    * across arms).
    *
    * Scale shape: one fact shuffle to user grain (persisted — the
    * frame feeds both the cap histogram and the arm means); the cap
    * quantile runs on the (distinct metric value) histogram — value
    * domain, not users — and comes back as a 1-row broadcast; arm
    * grain is ≤2 rows. All sums integer cents; only the final mean
    * division is double (pinned shape, mirrored in the oracle). */
  def winsorizedLift(events: DataFrame, pBp: Long = 9900L,
      splitPct: Int = 50, metricType: String = "purchase"): DataFrame = {
    require(pBp >= 1L && pBp <= 10000L, "pBp in [1, 10000]")
    val cents = floor(col("value") * lit(100.0)).cast("long")
    val metric = when(col("event_type") === metricType &&
      col("value").isNotNull, cents)
    val users = events
      .groupBy(col("user_id"))
      .agg(coalesce(sum(metric), lit(0L)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = Percentiles.valueQuantiles(users, "y", Seq(pBp))
      .select(col(s"__q$pBp").as("cap_cents"))
    users
      .withColumn("arm", armCol("user_id", splitPct))
      .crossJoin(broadcast(cap))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y")).as("__sy"),
        sum(least(col("y"), col("cap_cents"))).as("__sw"),
        min(col("cap_cents")).as("cap_cents"))
      .withColumn("raw_mean_cents",
        floor(col("__sy").cast("double") / col("n_users")).cast("long"))
      .withColumn("wins_mean_cents",
        floor(col("__sw").cast("double") / col("n_users")).cast("long"))
      .select(col("arm"), col("n_users"), col("cap_cents"),
        col("raw_mean_cents"), col("wins_mean_cents"))
  }

  /** Mann–Whitney rank-sum test (Mann & Whitney 1947) between the
    * two deterministic arms on the per-user event-count metric — the
    * nonparametric twin of [[abLift]]: ranks instead of means, so one
    * whale user can't buy a significant result. Exact integer output:
    * midranks carry in DOUBLED units (a tie group's average rank is
    * half-integral; rank2 = 2·cum_before + cnt + 1 is a BIGINT), so
    * rank sums and U statistics are exact cross-engine — no float
    * ranks, no normal approximation baked in. The effect size is the
    * common-language CLES = U / (n_a·n_b) in floor-bp (Vargha–Delaney
    * A): 5000 bp = stochastic equality; the reader applies whatever
    * z/exact table their n warrants to the exact U.
    *
    * Scale shape: one user-grain pass (the fact shuffle), then the
    * rank walk runs at metric-VALUE grain (distinct per-user counts —
    * a bounded domain, the q77 histogram trick), so the
    * single-partition cum window sees metadata, never users. Output
    * is 2 rows. */
  def mannWhitney(events: DataFrame, splitPct: Int = 50): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val users = events
      .groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", armCol("user_id", splitPct))
    val vals = users.groupBy(col("m"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("cnt_a"))
    val wv = Window.orderBy(col("m"))
    val agg = vals
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("rank2",
        lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
      .agg(sum(col("cnt")).as("n"), sum(col("cnt_a")).as("n_a"),
        sum(col("cnt_a") * col("rank2")).as("r_a2"))
    // R_B2 = n(n+1) − R_A2 (total doubled rank mass); U_A2 = R_A2 −
    // n_a(n_a+1); U_A + U_B = n_a·n_b
    agg.select(
        explode(array(
          struct(lit("A").as("arm"), col("n_a").as("n_users"),
            col("r_a2").as("rank_sum_x2"),
            (col("r_a2") - col("n_a") * (col("n_a") + 1L)).as("u_x2")),
          struct(lit("B").as("arm"), (col("n") - col("n_a")).as("n_users"),
            (col("n") * (col("n") + 1L) - col("r_a2")).as("rank_sum_x2"),
            (lit(2L) * col("n_a") * (col("n") - col("n_a")) -
              (col("r_a2") - col("n_a") * (col("n_a") + 1L))).as("u_x2"))))
          .as("s"),
        col("n_a"), col("n"))
      .select(col("s.arm").as("arm"), col("s.n_users"),
        col("s.rank_sum_x2"), col("s.u_x2"),
        when(col("n_a") === 0L || col("n") === col("n_a"),
          lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) * col("s.u_x2") /
            (lit(2.0) * col("n_a") * (col("n") - col("n_a"))))
            .cast("long")).as("cles_bp"))
      .orderBy(col("arm").asc)
  }

  /** Kolmogorov–Smirnov two-sample test between the deterministic
    * arms on the per-user event-count metric — the DISTRIBUTION-shape
    * complement of [[mannWhitney]]: the rank-sum test only sees
    * location (a variance-only treatment effect leaves U at chance),
    * KS flags ANY difference between the two empirical CDFs. Exact
    * integer statistic: D is computed as max over the value grid of
    * |cumA·n_b − cumB·n_a| (cross-multiplied BIGINTs — never a float
    * CDF subtraction), reported in floor-bp of n_a·n_b. The α=0.05
    * verdict is the large-sample rejection D > c(α)·√((n_a+n_b)/
    * (n_a·n_b)), c(0.05)=1.358, evaluated EXACTLY by squaring both
    * sides in DECIMAL(38,0): 10⁶·D_num² vs 1 844 164·(n_a+n_b)·n_a·n_b
    * — no sqrt, no libm (house rule).
    *
    * Scale shape: one user-grain pass (the fact shuffle), then the
    * CDF walk runs at metric-VALUE grain (the q77 histogram trick) —
    * the single-partition cum window sees distinct per-user counts,
    * never users. Output is 1 row. */
  def ksTest(events: DataFrame, splitPct: Int = 50): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val users = events
      .groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", armCol("user_id", splitPct))
    val vals = users.groupBy(col("m"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("cb"))
    val wv = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val dec = "decimal(38,0)"
    vals
      .withColumn("cum_a", sum(col("ca")).over(wv))
      .withColumn("cum_b", sum(col("cb")).over(wv))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .withColumn("diff",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("diff")).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) * col("d_num") /
            (col("n_a") * col("n_b"))).cast("long")).as("d_bp"),
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("int"))
          .otherwise((col("d_num").cast(dec) * col("d_num") * lit(1000000L) >
            lit(1844164L).cast(dec) * (col("n_a") + col("n_b")) *
              col("n_a") * col("n_b")).cast("int")).as("reject_05"))
  }

  /** Exact ROC-AUC of an engagement score predicting conversion —
    * the classifier-health number next to [[gainsTable]]'s deciles:
    * AUC = P(score of a random converter > score of a random
    * non-converter) + ½·P(tie), which is exactly the Mann–Whitney
    * U / (n_pos·n_neg) — so it reuses the q260 doubled-midrank
    * machinery (rank2 BIGINTs, no float ranks, ties handled by
    * construction) with the conversion LABEL in place of the arm.
    * Score = the user's non-conversion event count (does raw activity
    * predict purchase); the op is the template for any
    * (score, label) pair at user grain. One row: n_users, n_pos,
    * n_neg, auc_bp (5000 = uninformative).
    *
    * Scale shape: one user-grain pass, then the rank walk at
    * score-VALUE grain (q77 trick) — the window sees distinct
    * activity counts, never users. */
  def engagementAuc(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") =!= convType, 1L).otherwise(0L))
        .as("m"),
        max(when(col("event_type") === convType, 1L).otherwise(0L))
          .as("pos"))
    val vals = users.groupBy(col("m"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("cnt_pos"))
    val wv = Window.orderBy(col("m"))
    vals
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("rank2",
        lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
      .agg(sum(col("cnt")).as("n_users"), sum(col("cnt_pos")).as("n_pos"),
        sum(col("cnt_pos") * col("rank2")).as("r_pos2"))
      .select(col("n_users"), col("n_pos"),
        (col("n_users") - col("n_pos")).as("n_neg"),
        when(col("n_pos") === 0L || col("n_pos") === col("n_users"),
          lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (col("r_pos2") - col("n_pos") * (col("n_pos") + 1L)) /
            (lit(2.0) * col("n_pos") * (col("n_users") - col("n_pos"))))
            .cast("long")).as("auc_bp"))
  }

  /** Cumulative gains table — the model-evaluation readout next to
    * [[graft.ops.TextAnalysis.classifierCalibration]]'s reliability
    * buckets: rank the scored population best-first, cut it into
    * `nBins` equal-depth tiers, and report each tier's conversion
    * rate plus the cumulative share of ALL converters captured so
    * far ("the top 20% of scores holds 60% of converters" — the
    * targeting-budget curve).
    *
    * Tiers use [[Percentiles.equiDepthBins]]' exact last-rank rule
    * over score DESC (tier 1 = best; a tied score lands whole in one
    * tier, so heavy score ties surface as fat tiers, never split
    * arbitrarily). Same scale shape too: one score-grain aggregate,
    * cumulative windows over DISTINCT scores, a ≤nBins-row report.
    *
    * Columns: tier, n_rows, n_converters, conv_bp, cum_gain_bp. */
  def gainsTable(scored: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val whole = Window.partitionBy()
    scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol))
      .agg(count(lit(1)).as("cnt"), sum(col(labelCol)).as("conv"))
      .withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col(scoreCol).desc)))
      .withColumn("n", sum(col("cnt")).over(whole))
      .withColumn("tier", expr(s"(cum - 1L) * ${nBins}L div n + 1L"))
      .groupBy(col("tier"))
      .agg(sum(col("cnt")).as("n_rows"), sum(col("conv")).as("n_converters"))
      .withColumn("conv_bp",
        floor(lit(10000.0) * col("n_converters") / col("n_rows")).cast("long"))
      .withColumn("cum_conv",
        sum(col("n_converters")).over(Window.orderBy(col("tier").asc)))
      .withColumn("total_conv", sum(col("n_converters")).over(whole))
      .withColumn("cum_gain_bp",
        when(col("total_conv") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("cum_conv") / col("total_conv"))
            .cast("long")))
      .select(col("tier"), col("n_rows"), col("n_converters"),
        col("conv_bp"), col("cum_gain_bp"))
      .orderBy(col("tier").asc)
  }

  /** χ²(1) critical value at α=0.05 in bp (3.8415 — the textbook
    * significance bar for a 2×2 independence test). */
  val ChiSqCrit1DfBp = 38415L

  /** Pearson χ² independence test on the arm × converted 2×2 table —
    * the significance read next to [[abLift]]'s effect size (a lift
    * without a χ² is a coin-flip story). Uses the 2×2 closed form
    * χ² = N·(ad−bc)²/(R_A·R_B·C₁·C₀), computed in decimal(38,0) with
    * ONE integral division, so chi2_bp is bit-identical cross-engine
    * (per-cell (O−E)²/E floors would each truncate differently).
    * `significant` compares against the α=0.05 critical value
    * [[ChiSqCrit1DfBp]]; NULL χ² when any margin is empty (the test
    * is undefined, not "not significant").
    *
    * Scale shape: one user-grain fact pass (arm is a pure hash of
    * user_id, conversion a max flag), then a single 4-sum aggregate;
    * all χ² arithmetic runs on the one-row result. */
  def chiSquareLift(events: DataFrame, splitPct: Int = 50,
      convType: String = "purchase"): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val users = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("pos"))
      .withColumn("arm", armCol("user_id", splitPct))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    users
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("pos")).otherwise(0L))
          .as("conv_a"),
        sum(col("pos")).as("conv_all"))
      .withColumn("n_b", col("n_users") - col("n_a"))
      .withColumn("conv_b", col("conv_all") - col("conv_a"))
      // det = ad − bc over the 2×2 (converted × arm) cells
      .withColumn("__det",
        dec(col("conv_a")) * dec(col("n_b") - col("conv_b")) -
          dec(col("conv_b")) * dec(col("n_a") - col("conv_a")))
      .withColumn("__den",
        dec(col("n_a")) * dec(col("n_b")) * dec(col("conv_all")) *
          dec(col("n_users") - col("conv_all")))
      .withColumn("chi2_bp",
        when(col("__den") === dec(lit(0L)), lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * n_users * __det * __det)" +
              " DIV __den AS BIGINT)")))
      .select(col("n_users"), col("n_a"), col("n_b"),
        col("conv_a"), col("conv_b"), col("chi2_bp"),
        when(col("chi2_bp").isNull, lit(null).cast("int"))
          .otherwise((col("chi2_bp") >= ChiSqCrit1DfBp).cast("int"))
          .as("significant"))
  }

  /** Poisson(1) inverse-CDF thresholds scaled to 2^32 (floor of the
    * cumulative), shared verbatim with the oracle: a uniform 32-bit
    * md5 draw below threshold k gets bootstrap weight k; past the
    * last one it caps at 9 (tail mass ~8e-10 at cap+1). */
  val PoissonCdf32: Seq[Long] = Seq(1580030168L, 3160060337L,
    3950075421L, 4213413783L, 4279248373L, 4292415291L, 4294609777L,
    4294923276L, 4294962463L)

  private def poissonWeight(draw: Column): Column =
    PoissonCdf32.zipWithIndex.foldRight(lit(PoissonCdf32.length.toLong)) {
      case ((c, k), rest) => when(draw < c, k.toLong).otherwise(rest)
    }

  /** Poisson-bootstrap confidence interval for the A/B conversion
    * lift — the resampling pattern that actually runs at fleet scale
    * (Chamandy '12): a classical bootstrap re-DRAWS users per
    * replicate (B full shuffles of the fact table); the Poisson
    * bootstrap gives every user an independent Poisson(1) replicate
    * weight instead, so all `b` replicates ride ONE user-grain pass
    * as a ×B map fan-out, and each replicate's conversion rate is a
    * weighted mean. Weights come from the house md5 draw at the
    * (user, replicate) key — deterministic, cross-engine, and
    * independent of the arm draw (different key string). Replicate
    * deltas are floored to bp; the interval is the empirical
    * 2/32–31/32 spread (B=32 keeps the output a metadata-sized
    * exact-sortable set; widen B for tighter tails, the cost is the
    * fan-out factor). `covers_zero` = the ship/no-ship read.
    *
    * Scale shape: one fact shuffle to user grain (persisted: the
    * observed delta and the replicate fan-out both read it), a ×B
    * user-grain map, one (b, arm)-grain aggregate (2B rows,
    * map-side combined), and all interval arithmetic on ≤B rows. */
  def bootstrapCi(events: DataFrame, splitPct: Int = 50,
      convType: String = "purchase", b: Int = 32): DataFrame = {
    require(b >= 4 && b <= 256, "replicates in [4,256]")
    val users = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("pos"))
      .withColumn("arm", armCol("user_id", splitPct))
      .persist()
    val rateBp = (cw: Column, nw: Column) =>
      when(nw > 0L, floor(lit(10000.0) * cw / nw).cast("long"))
    val deltas = users
      .select(col("user_id"), col("pos"), col("arm"),
        explode(array((0 until b).map(i => lit(i)): _*)).as("b"))
      .withColumn("draw", expr(
        "CAST(conv(substring(md5(concat(CAST(user_id AS STRING), '_', " +
          "CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("w", poissonWeight(col("draw")))
      .groupBy(col("b"), col("arm"))
      .agg(sum(col("w")).as("nw"), sum(col("w") * col("pos")).as("cw"))
      .groupBy(col("b"))
      .agg(
        rateBp(sum(when(col("arm") === "A", col("cw"))),
          sum(when(col("arm") === "A", col("nw")))).as("__ra"),
        rateBp(sum(when(col("arm") === "B", col("cw"))),
          sum(when(col("arm") === "B", col("nw")))).as("__rb"))
      .select((col("__ra") - col("__rb")).as("delta_bp"))
      .filter(col("delta_bp").isNotNull)
    val spread = deltas.agg(
      sort_array(collect_list(col("delta_bp"))).as("ds"))
      .select(size(col("ds")).cast("long").as("n_reps"),
        element_at(col("ds"), 2).as("boot_lo_bp"),
        element_at(col("ds"), expr("CAST(size(ds) DIV 2 AS INT)"))
          .as("boot_med_bp"),
        element_at(col("ds"), expr("size(ds) - 1")).as("boot_hi_bp"))
    val observed = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("c"))
      .agg(count(lit(1)).as("__arms"),
        rateBp(sum(when(col("arm") === "A", col("c"))),
          sum(when(col("arm") === "A", col("n")))).as("__oa"),
        rateBp(sum(when(col("arm") === "B", col("c"))),
          sum(when(col("arm") === "B", col("n")))).as("__ob"),
        sum(col("n")).as("n_users"))
      .select(col("n_users"), (col("__oa") - col("__ob")).as("obs_delta_bp"))
    observed.crossJoin(broadcast(spread))
      .withColumn("covers_zero",
        (col("boot_lo_bp") <= 0L && col("boot_hi_bp") >= 0L).cast("int"))
  }

  /** Difference-in-differences panel — the observational-causal
    * estimator for a rollout that hit one REGION at a date the other
    * region never saw (pricing change, carrier switch, UI launch):
    * did = (treat_post − treat_pre) − (ctrl_post − ctrl_pre) on mean
    * order value. The control group's delta absorbs the common time
    * trend; what survives the double difference is the treatment
    * effect — VALID ONLY under parallel pre-trends, which is the
    * analyst's check, not the estimator's (the per-group means are in
    * the output exactly so that check can be eyeballed). Means are
    * floor-divided house cents; `did_cents` is carried on both rows.
    *
    * Scale shape: the customer dim collapses to (custkey, grp) before
    * the fact join (nation/region broadcast into it); ONE fact pass
    * lands on group grain (2 rows, 4 conditional sums), and every
    * estimator subtraction runs on that 2-row frame. The 1-row `did`
    * summary re-enters via broadcast — the house scalar pattern. */
  def diffInDiff(orders: DataFrame, customer: DataFrame, nation: DataFrame,
      region: DataFrame, treated: String = "ASIA",
      control: String = "AMERICA", cutoff: String = "1998-01-01"): DataFrame = {
    val dim = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin(treated, control))
      .select(col("c_custkey"),
        when(col("r_name") === treated, lit("TREAT"))
          .otherwise(lit("CTRL")).as("grp"))
    val g = orders
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        (to_date(col("o_orderdate")) >= lit(cutoff).cast("date"))
          .cast("long").as("post"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("grp"))
      .agg(
        sum(lit(1L) - col("post")).as("n_pre"),
        sum(col("post")).as("n_post"),
        sum(when(col("post") === 0L, col("cents")).otherwise(0L))
          .as("__c_pre"),
        sum(when(col("post") === 1L, col("cents")).otherwise(0L))
          .as("__c_post"))
      .withColumn("mean_pre_cents",
        when(col("n_pre") > 0L, expr("__c_pre DIV n_pre")))
      .withColumn("mean_post_cents",
        when(col("n_post") > 0L, expr("__c_post DIV n_post")))
      .withColumn("delta_cents",
        col("mean_post_cents") - col("mean_pre_cents"))
      // 2 rows, read by the did scalar AND the output join — persist
      // so the fact join runs once (caller-owns-cache convention)
      .persist()
    val did = g.agg(
      (sum(when(col("grp") === "TREAT", col("delta_cents")))
        - sum(when(col("grp") === "CTRL", col("delta_cents"))))
        .as("did_cents"))
    g.crossJoin(broadcast(did))
      .select(col("grp"), col("n_pre"), col("n_post"),
        col("mean_pre_cents"), col("mean_post_cents"), col("delta_cents"),
        col("did_cents"))
      .orderBy(col("grp").asc)
  }

  /** Event-study (dynamic) difference-in-differences — the modern
    * panel read [[diffInDiff]]'s single 2×2 collapses away: per month
    * RELATIVE to the rollout, the treated−control gap normalized to
    * the month just before treatment (rel −1, the canonical
    * reference). The pre-period effect rows ARE the parallel-trends
    * diagnostic — q282 can only caveat the assumption, this table
    * shows it — and the post rows expose ramp-up or fade-out a
    * single post average hides.
    *
    * Exactness: monthly means by integral DIV on exact cents;
    * effect(r) = gap(r) − gap(−1) over those floored means (the
    * q327 micro-floor trade); arithmetic month alignment (the q320
    * rule). Missing arm or missing reference month → NULLs, never a
    * silent zero.
    *
    * Scale shape: one fact pass (orders ⋈ broadcast region-filtered
    * customer dim) to (group, month) grain; the relative-month
    * window, the reference row, and the report are calendar
    * metadata.
    *
    * Columns: rel_month ∈ [−maxWindow, maxWindow−1], n_treat,
    * n_ctrl, mean_treat_cents, mean_ctrl_cents, gap_cents,
    * effect_cents (NULL at rel −1's own row it is 0 by
    * construction). */
  def didEventStudy(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame, treated: String = "ASIA",
      control: String = "AMERICA", cutoff: String = "1998-01-01",
      maxWindow: Int = 6): DataFrame = {
    require(maxWindow >= 2, "maxWindow must be >= 2")
    val cutM = {
      val d = java.time.LocalDate.parse(cutoff)
      12L * d.getYear + d.getMonthValue - 1L
    }
    val dim = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin(treated, control))
      .select(col("c_custkey"),
        when(col("r_name") === treated, lit("TREAT"))
          .otherwise(lit("CTRL")).as("grp"))
    val cells = orders
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .withColumn("rel", col("m") - lit(cutM))
      .filter(col("rel") >= -maxWindow.toLong &&
        col("rel") < maxWindow.toLong)
      .groupBy(col("rel"))
      .agg(
        sum(when(col("grp") === "TREAT", 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("grp") === "CTRL", 1L).otherwise(0L)).as("n_ctrl"),
        coalesce(sum(when(col("grp") === "TREAT", col("cents"))), lit(0L))
          .as("__ct"),
        coalesce(sum(when(col("grp") === "CTRL", col("cents"))), lit(0L))
          .as("__cc"))
      .withColumn("mean_treat_cents",
        when(col("n_treat") > 0L, expr("__ct DIV n_treat")))
      .withColumn("mean_ctrl_cents",
        when(col("n_ctrl") > 0L, expr("__cc DIV n_ctrl")))
      .withColumn("gap_cents",
        col("mean_treat_cents") - col("mean_ctrl_cents"))
      .localCheckpoint(false) // ≤2·maxWindow rows; cuts the fact lineage
    val base = cells.filter(col("rel") === -1L)
      .select(col("gap_cents").as("__base"))
    cells.join(broadcast(base), lit(true), "left")
      .select(col("rel").as("rel_month"), col("n_treat"), col("n_ctrl"),
        col("mean_treat_cents"), col("mean_ctrl_cents"), col("gap_cents"),
        (col("gap_cents") - col("__base")).as("effect_cents"))
      .orderBy(col("rel_month").asc)
  }

  /** Deterministic re-randomization (permutation) test on the arm
    * mean difference of per-user event counts — the
    * assumption-free inference tool next to [[mannWhitney]] (rank
    * location) and [[ksTest]] (distribution shape): re-draw the arm
    * assignment `reps` times from an md5 stream keyed (user, rep) —
    * the q289 bootstrap convention, so every engine and every run
    * sees the SAME `reps` pseudo-experiments — and count how often a
    * re-randomized |mean diff| reaches the observed one.
    * p = (1+n_extreme)/(reps+1), the add-one permutation p-value
    * (Phipson & Smyth 2010; never exactly 0).
    *
    * All comparisons exact-integer: |mean diff| is a floored micro
    * magnitude via one decimal(38,0) cross-multiplied DIV per
    * pseudo-experiment (nonnegative numerator — the cross-engine
    * DIV rule; the observed stat carries its sign separately) and
    * floor ties count as extreme, so the verdict is deterministic.
    *
    * Scale shape: ONE user-grain collapse (the fact shuffle), then
    * the replicate explode runs at user×reps grain but map-side
    * partial aggregation collapses it to `reps` rows before the
    * (tiny) replicate shuffle; the p-value is a ≤reps-row fold.
    * Output is 1 row.
    *
    * Columns: n_users, n_a, n_b, t_obs_micro, reps, n_extreme,
    * p_milli. */
  def permutationTest(events: DataFrame, splitPct: Int = 50,
      reps: Int = 200): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    require(reps >= 1 && reps <= 10000, "reps in [1,10000]")
    val dec = "decimal(38,0)"
    // localCheckpoint, NOT persist: a cached copy of this user-grain
    // frame is structurally identical to q260/q295's subtree, and
    // CacheManager would substitute it into THEIR plans (the q299
    // cross-query cache-substitution lesson) — the checkpoint serves
    // the same two readers without entering the cache registry
    val users = events
      .groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", armCol("user_id", splitPct))
      .localCheckpoint(false)
    // |mean diff| in micro units: the DIV runs on a NONNEGATIVE
    // numerator (Spark DIV truncates toward zero, DuckDB // floors —
    // they only agree on nonnegatives, the house rule), the sign is
    // re-applied outside
    // BOTH cross-products in decimal(38,0): (s−s_a)·n_a is a
    // Long×Long product that wraps silently past 2^63 where the
    // oracle's HUGEINT stays exact (round-9 advice — the same
    // boundary-product class as abcXyz/revenueRetention)
    def tMicro(nC: String, naC: String, saC: String, sC: String) =
      expr(s"""CAST((1000000 * abs(CAST($saC AS $dec) * ($nC - $naC)
        | - CAST($sC - $saC AS $dec) * $naC)) DIV (CAST($naC AS $dec) * ($nC - $naC))
        |AS BIGINT)""".stripMargin)
    def tSign(nC: String, naC: String, saC: String, sC: String) =
      expr(s"""CASE WHEN CAST($saC AS $dec) * ($nC - $naC)
        | < CAST($sC - $saC AS $dec) * $naC THEN -1 ELSE 1 END""".stripMargin)
    val obs = users.agg(
        count(lit(1)).as("n"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("m")).otherwise(0L)).as("s_a"),
        sum(col("m")).as("s"))
      .select(col("n"), col("n_a"), col("s_a"), col("s"),
        when(col("n_a") === 0L || col("n") === col("n_a"),
          lit(null).cast("long"))
          .otherwise(tSign("n", "n_a", "s_a", "s") *
            tMicro("n", "n_a", "s_a", "s")).as("t_obs_micro"))
    val perms = users
      .select(col("m"),
        explode(expr(s"sequence(1, $reps)")).as("rep"),
        col("user_id"))
      .withColumn("in_a",
        expr(s"""CAST(conv(substring(md5(CAST(user_id AS STRING) || ':' ||
          |CAST(rep AS STRING)), 1, 8), 16, 10) AS BIGINT)
          |% 100""".stripMargin) < splitPct)
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("in_a"), col("m")).otherwise(0L)).as("sa"),
        sum(col("m")).as("sr"))
      .select(col("rep"),
        when(col("na") === 0L || col("n") === col("na"),
          lit(null).cast("long"))
          .otherwise(tMicro("n", "na", "sa", "sr")).as("t_abs_micro"))
    perms.crossJoin(broadcast(obs))
      .agg(max(col("n")).as("n_users"), max(col("n_a")).as("n_a"),
        max(col("n") - col("n_a")).as("n_b"),
        max(col("t_obs_micro")).as("t_obs_micro"),
        count(lit(1)).as("reps"),
        sum((coalesce(col("t_abs_micro"), lit(0L)) >=
          abs(coalesce(col("t_obs_micro"), lit(0L)))).cast("long"))
          .as("n_extreme"))
      .withColumn("p_milli",
        expr("(1000 * (1 + n_extreme)) DIV (reps + 1)"))
      // empty-input parity: the oracle's GROUP-BY-free CTE chain
      // yields 0 rows on an empty events table, while a global agg
      // here would emit one degenerate (reps=0) row — drop it
      .filter(col("reps") > 0L)
  }

  /** Minimum-detectable-effect / power calculator from exact moments
    * — the experiment-DESIGN twin of [[abLift]]'s readout: given the
    * live arm split and the per-user metric's empirical variance,
    * the smallest true mean shift a z-test at α=0.05 (two-sided)
    * would detect with 80% power,
    *   MDE = (z_{α/2}+z_β)·√(s²_A/n_A + s²_B/n_B),
    * z constants fixed in milli (1960, 842 — published normal
    * quantiles, not libm calls). Every experiment platform shows
    * this number next to the enrollment curve; a metric whose MDE
    * exceeds any plausible effect is not worth the traffic.
    *
    * Exact integer ladder (identical in the oracle): sample
    * variances via n·Σx²−(Σx)² in decimal(38,0) DIV'd to micro
    * units, the SE via pico-scaled sums and one exact ⌊√⌋, the
    * relative MDE against the POOLED mean in bp.
    *
    * Scale shape: one user-grain pass collapsing straight to a
    * 1-row moment set; everything after is scalar arithmetic.
    *
    * Columns: n_a, n_b, mean_a_milli, mean_b_milli, var_a_milli,
    * var_b_milli, mde_abs_micro, mde_rel_bp. */
  def mdePower(events: DataFrame, splitPct: Int = 50): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val dec = "decimal(38,0)"
    val zSumMilli = 1960L + 842L
    events
      .groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", armCol("user_id", splitPct))
      .agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("m")).otherwise(0L)).as("s_a"),
        sum(when(col("arm") === "B", col("m")).otherwise(0L)).as("s_b"),
        sum(when(col("arm") === "A",
          expr(s"CAST(m AS $dec) * m")).otherwise(lit(0L).cast(dec)))
          .as("q_a"),
        sum(when(col("arm") === "B",
          expr(s"CAST(m AS $dec) * m")).otherwise(lit(0L).cast(dec)))
          .as("q_b"))
      .withColumn("mean_a_milli",
        when(col("n_a") > 0L, expr("(1000 * s_a) DIV n_a")))
      .withColumn("mean_b_milli",
        when(col("n_b") > 0L, expr("(1000 * s_b) DIV n_b")))
      .withColumn("var_a_milli", when(col("n_a") > 1L, expr(
        s"""CAST((1000 * (n_a * q_a - CAST(s_a AS $dec) * s_a))
           |DIV (CAST(n_a AS $dec) * (n_a - 1)) AS BIGINT)""".stripMargin)))
      .withColumn("var_b_milli", when(col("n_b") > 1L, expr(
        s"""CAST((1000 * (n_b * q_b - CAST(s_b AS $dec) * s_b))
           |DIV (CAST(n_b AS $dec) * (n_b - 1)) AS BIGINT)""".stripMargin)))
      .withColumn("__se2_pico",
        when(col("n_a") > 1L && col("n_b") > 1L,
          expr("(1000000000 * var_a_milli) DIV n_a" +
            " + (1000000000 * var_b_milli) DIV n_b")))
      .withColumn("mde_abs_micro",
        when(col("__se2_pico").isNotNull,
          expr(s"($zSumMilli * ${isqrtSql("__se2_pico")}) DIV 1000")))
      .withColumn("mde_rel_bp",
        when(col("mde_abs_micro").isNotNull && col("s_a") + col("s_b") > 0L,
          expr(s"""CAST((10000 * CAST(mde_abs_micro AS $dec)
            | * (n_a + n_b)) DIV (1000000 * (CAST(s_a AS $dec) + s_b))
            |AS BIGINT)""".stripMargin)))
      .select(col("n_a"), col("n_b"), col("mean_a_milli"),
        col("mean_b_milli"), col("var_a_milli"), col("var_b_milli"),
        col("mde_abs_micro"), col("mde_rel_bp"))
  }

  /** Exact ⌊√x⌋ as a SQL snippet (BIGINT; IEEE seed + ±2 correction
    * — the q204 convention, usable inside expr chains). */
  private[graft] def isqrtSql(x: String): String =
    s"""(CASE
       |  WHEN (CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) + 2)
       |     * (CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) + 2) <= $x
       |  THEN CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) + 2
       |  WHEN (CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) + 1)
       |     * (CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) + 1) <= $x
       |  THEN CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) + 1
       |  WHEN CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT)
       |     * CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) <= $x
       |  THEN CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT)
       |  ELSE CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT) - 1
       |END)""".stripMargin

  /** Exact ⌊√x⌋ for DECIMAL(38,0) expressions (SQL snippet): IEEE
    * seed + ±2 correction with the squared candidates compared in
    * decimal — the [[isqrtSql]] twin for inputs past 2^62. Result
    * BIGINT (valid while x ≲ 10^37, i.e. the root fits a long). */
  private[graft] def isqrtDecSql(x: String): String = {
    val dec = "decimal(38,0)"
    val y0 = s"CAST(FLOOR(SQRT(CAST(($x) AS DOUBLE))) AS BIGINT)"
    s"""(CASE
       |  WHEN CAST($y0 + 2 AS $dec) * ($y0 + 2) <= ($x) THEN $y0 + 2
       |  WHEN CAST($y0 + 1 AS $dec) * ($y0 + 1) <= ($x) THEN $y0 + 1
       |  WHEN CAST($y0 AS $dec) * $y0 <= ($x) THEN $y0
       |  ELSE $y0 - 1
       |END)""".stripMargin
  }

  /** Wilson score interval for per-arm conversion — the
    * small-x-safe CI (Wilson 1927; the interval recommendation in
    * Brown, Cai & DasGupta 2001) the naive Wald ±z√(p̂q̂/n) gets
    * wrong near 0/1: bounds never leave [0,1] and never collapse to
    * a point at x=0. Computed exactly in micro units,
    *   bound = (2·10⁶x + c ± z·⌊√((4·10⁶·x(n−x)) DIV n + c)⌋)
    *           / (2(10⁶n + c)),  z=1960 milli, c=z²=3 841 600,
    * every floor shared by the oracle so the bounds are
    * deterministic (at x=0 the lower bound is exactly 0 because
    * isqrt(c) = 1960 exactly).
    *
    * Scale shape: one user-grain pass to (arm, n, x); the ladder is
    * scalar arithmetic on ≤2 rows.
    *
    * Columns: arm, n_users, n_converted, p_micro, wilson_lo_micro,
    * wilson_hi_micro. */
  def wilsonCi(events: DataFrame, splitPct: Int = 50,
      convType: String = "purchase"): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val dec = "decimal(38,0)"
    events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_converted"))
      .withColumn("p_micro",
        expr("(1000000 * n_converted) DIV n_users"))
      .withColumn("__root", expr(s"""${isqrtDecSql(
        s"""(4000000 * CAST(n_converted AS $dec) *
           | (n_users - n_converted)) DIV n_users + 3841600"""
          .stripMargin)}""".stripMargin))
      .withColumn("__den",
        expr(s"2 * (1000000 * CAST(n_users AS $dec) + 3841600)"))
      .withColumn("wilson_lo_micro", expr(s"""CAST(
        |(1000000 * greatest(2000000 * CAST(n_converted AS $dec)
        |   + 3841600 - 1960 * __root, CAST(0 AS $dec)))
        |DIV __den AS BIGINT)""".stripMargin))
      .withColumn("wilson_hi_micro", expr(s"""CAST(
        |(1000000 * (2000000 * CAST(n_converted AS $dec)
        |   + 3841600 + 1960 * __root))
        |DIV __den AS BIGINT)""".stripMargin))
      .select(col("arm"), col("n_users"), col("n_converted"),
        col("p_micro"), col("wilson_lo_micro"), col("wilson_hi_micro"))
      .orderBy(col("arm").asc)
  }

  /** Delta-method confidence interval for a RATIO metric — revenue
    * cents per event, the Σr/Σs shape (Deng, Knoblich & Lu 2011/
    * 2018's ratio-metric variance) where per-user revenue and
    * per-user activity are correlated, so the naive per-user-average
    * SE is wrong in both directions. Per arm:
    *   R = Σr/Σs,  Var(R) ≈ (S_rr − 2R·S_rs + R²·S_ss) / ((n−1)·Σs²)
    * with S_xy = n·Σxy − Σx·Σy (exact decimal(38,0) cross-moments;
    * R enters in milli so every product is integral). The 95% CI is
    * R ∓ 1.96·SE with the same fixed z-milli as [[mdePower]].
    *
    * Scale shape: one user-grain pass to (r, s) per user, one
    * arm-grain moment collapse, scalar ladder after; 2 rows out.
    *
    * Columns: arm, n_users, sum_cents, sum_events, ratio_milli,
    * se_milli, ci_lo_milli, ci_hi_milli. */
  def ratioDelta(events: DataFrame, splitPct: Int = 50,
      convType: String = "purchase"): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    val dec = "decimal(38,0)"
    events
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === convType,
          floor(col("value") * lit(100.0)).cast("long"))), lit(0L))
          .as("r"),
        count(lit(1)).as("s"))
      .withColumn("arm", armCol("user_id", splitPct))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r")).as("sum_cents"),
        sum(col("s")).as("sum_events"),
        sum(expr(s"CAST(r AS $dec) * r")).as("qrr"),
        sum(expr(s"CAST(r AS $dec) * s")).as("qrs"),
        sum(expr(s"CAST(s AS $dec) * s")).as("qss"))
      .withColumn("ratio_milli",
        when(col("sum_events") > 0L,
          expr("(1000 * sum_cents) DIV sum_events")))
      // micro-scaled delta-method numerator: 10⁶·S_rr − 2·10³·R·S_rs
      // + R²·S_ss, R in milli (exact integral products)
      .withColumn("__vnum", when(col("ratio_milli").isNotNull, expr(
        s"""1000000 * (n_users * qrr - CAST(sum_cents AS $dec) * sum_cents)
           | - 2000 * ratio_milli *
           |   (n_users * qrs - CAST(sum_cents AS $dec) * sum_events)
           | + CAST(ratio_milli AS $dec) * ratio_milli *
           |   (n_users * qss - CAST(sum_events AS $dec) * sum_events)"""
          .stripMargin)))
      // the radicand is ~1e6·n·Var(r_cents) and exceeds 2^63 at
      // modest scale (≈1e5 users with σ≈$100/user) — keep it in
      // decimal(38,0) and take the root with isqrtDecSql, the same
      // >2^62 pattern wilsonCi uses (round-9 advice; a BIGINT cast
      // here NULLs silently where the oracle's HUGEINT cast errors)
      .withColumn("__rad",
        when(col("n_users") > 1L && col("__vnum").isNotNull,
          expr(s"GREATEST(__vnum, CAST(0 AS $dec)) DIV (n_users - 1)")))
      .withColumn("se_milli",
        when(col("__rad").isNotNull,
          expr(s"${isqrtDecSql("__rad")} DIV sum_events")))
      .withColumn("ci_lo_milli",
        col("ratio_milli") - expr("(1960 * se_milli) DIV 1000"))
      .withColumn("ci_hi_milli",
        col("ratio_milli") + expr("(1960 * se_milli) DIV 1000"))
      .select(col("arm"), col("n_users"), col("sum_cents"),
        col("sum_events"), col("ratio_milli"), col("se_milli"),
        col("ci_lo_milli"), col("ci_hi_milli"))
      .orderBy(col("arm").asc)
  }

  /** Quantile treatment effects — the DISTRIBUTIONAL readout next to
    * [[abLift]]'s mean (Koenker & Bassett's quantile lens on an A/B
    * split): at each requested level, the per-arm nearest-rank
    * quantile of the per-user event count and their difference. A
    * mean lift driven entirely by the p90 tail and one spread evenly
    * across the distribution are DIFFERENT products; the mean can't
    * tell them apart, the QTE row set can. Nearest-rank = value at
    * rank ⌈p·n/10⁴⌉ (exact integer ceil, per-arm user_id tie-break)
    * so every output is an observed value — no interpolation, no
    * floats, identical in the oracle.
    *
    * Scale shape: one user-grain collapse (the fact shuffle), one
    * per-arm rank window over user-grain rows, a ≤2·|levels| pick.
    * Columns: p_bp, q_a, q_b, qte. */
  def quantileTreatment(events: DataFrame, splitPct: Int = 50,
      levelsBp: Seq[Long] = Seq(2500L, 5000L, 7500L, 9000L)): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    require(levelsBp.nonEmpty && levelsBp == levelsBp.sorted &&
      levelsBp.forall(p => p > 0L && p <= 10000L), "levels in (0,1] bp, asc")
    import org.apache.spark.sql.expressions.Window
    val wArm = Window.partitionBy(col("arm"))
      .orderBy(col("m").asc, col("user_id").asc)
    val ranked = events
      .groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", armCol("user_id", splitPct))
      .withColumn("rn", row_number().over(wArm).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("arm")))
        .cast("long"))
    ranked
      .select(col("arm"), col("m"), col("rn"), col("n"),
        explode(array(levelsBp.map(lit): _*)).as("p_bp"))
      .filter(col("rn") === expr("(p_bp * n + 9999) DIV 10000"))
      .groupBy(col("p_bp"))
      .agg(max(when(col("arm") === "A", col("m"))).as("q_a"),
        max(when(col("arm") === "B", col("m"))).as("q_b"))
      .withColumn("qte", col("q_b") - col("q_a"))
      .orderBy(col("p_bp").asc)
  }

  /** Benjamini–Hochberg FDR screen over a FAMILY of per-event-type
    * permutation tests (Benjamini & Hochberg 1995) — the
    * multiple-testing guard every metrics dashboard needs: run the
    * [[permutationTest]] arm-difference test once per event type
    * (population per test = users with ≥1 event of that type; the
    * md5(user:rep) pseudo-assignments are SHARED across the family,
    * the standard reuse) and apply the step-up rule at
    * `alphaMilli`/1000: reject every type ranked ≤ i* where
    * i* = max{i : pᵢ·m ≤ α·i}, all comparisons exact integer —
    * no float α·i/m quotient anywhere.
    *
    * Scale shape: ONE (user, type)-grain collapse (the fact
    * shuffle); the ×reps explode map-side-combines to (type, reps)
    * grain before its (tiny) shuffle; the BH walk is a ≤|types|-row
    * window. Columns: event_type, n_users, p_milli, p_rank,
    * bh_threshold_milli, reject. */
  def fdrScreen(events: DataFrame, splitPct: Int = 50, reps: Int = 100,
      alphaMilli: Long = 50L): DataFrame = {
    require(splitPct >= 1 && splitPct <= 99, "splitPct in [1,99]")
    require(reps >= 1 && reps <= 10000, "reps in [1,10000]")
    require(alphaMilli >= 1 && alphaMilli < 1000, "alphaMilli in [1,1000)")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val ut = events
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("m"))
      .withColumn("arm", armCol("user_id", splitPct))
      .localCheckpoint(false) // feeds obs + the ×reps explode
    def tMicro(nC: String, naC: String, saC: String, sC: String) =
      expr(s"""CAST((1000000 * abs(CAST($saC AS $dec) * ($nC - $naC)
        | - CAST($sC - $saC AS $dec) * $naC))
        | DIV (CAST($naC AS $dec) * ($nC - $naC)) AS BIGINT)"""
        .stripMargin)
    val obs = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("m")).otherwise(0L)).as("s_a"),
        sum(col("m")).as("s"))
      .select(col("event_type"), col("n"),
        when(col("n_a") === 0L || col("n") === col("n_a"),
          lit(null).cast("long"))
          .otherwise(tMicro("n", "n_a", "s_a", "s")).as("t_obs_micro"))
    val perms = ut
      .select(col("event_type"), col("m"), col("user_id"),
        explode(expr(s"sequence(1, $reps)")).as("rep"))
      .withColumn("in_a",
        expr(s"""CAST(conv(substring(md5(CAST(user_id AS STRING) || ':' ||
          |CAST(rep AS STRING)), 1, 8), 16, 10) AS BIGINT)
          |% 100""".stripMargin) < splitPct)
      .groupBy(col("event_type"), col("rep"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("in_a"), col("m")).otherwise(0L)).as("sa"),
        sum(col("m")).as("sr"))
      .select(col("event_type"),
        when(col("na") === 0L || col("n") === col("na"),
          lit(null).cast("long"))
          .otherwise(tMicro("n", "na", "sa", "sr")).as("t_abs_micro"))
    val pvals = perms
      .join(broadcast(obs), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_users"), count(lit(1)).as("reps"),
        sum((coalesce(col("t_abs_micro"), lit(0L)) >=
          abs(coalesce(col("t_obs_micro"), lit(0L)))).cast("long"))
          .as("n_extreme"))
      .withColumn("p_milli",
        expr("(1000 * (1 + n_extreme)) DIV (reps + 1)"))
    val wP = Window.orderBy(col("p_milli").asc, col("event_type").asc)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    pvals // ≤|types| rows from here on — single-partition metadata
      .withColumn("p_rank", row_number().over(wP).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("bh_threshold_milli",
        expr(s"($alphaMilli * p_rank) DIV __m"))
      .withColumn("__istar", max(when(
        col("p_milli") * col("__m") <= lit(alphaMilli) * col("p_rank"),
        col("p_rank"))).over(wAll))
      .select(col("event_type"), col("n_users"), col("p_milli"),
        col("p_rank"), col("bh_threshold_milli"),
        (col("p_rank") <= coalesce(col("__istar"), lit(0L)))
          .cast("int").as("reject"))
      .orderBy(col("p_rank").asc)
  }
}
