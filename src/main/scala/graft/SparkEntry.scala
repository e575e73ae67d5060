package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry returns a DataFrame whose column NAMES and VALUES match
  * its `oracleSql` (DuckDB) twin exactly. Determinism rules applied
  * throughout (SURVEY.md §7.3): decimal-exact money sums, integer
  * basis-point ratios (one IEEE divide + floor), string-formatted
  * timestamps, sorted distinct-concats, id tie-breaks on every rank.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.sessionAggr(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.pricingSummary _),
    "q02_sessionize" -> (Queries.sessionAggr _),
    "q03_session_stats" -> (Queries.sessionStats _),
    "q04_session_filter" -> (Queries.sessionFilter _),
    "q05_top_categories" -> (Queries.topCategories _),
    "q06_top_sessions_per_category" -> (Queries.topSessionsPerCategory _),
    "q07_page_funnel" -> (Queries.pageFunnel _),
    "q08_area_top3_products" -> (Queries.areaTop3Products _),
    "q09_order_priority_semi" -> (Queries.orderPrioritySemi _),
    "q10_customer_anti" -> (Queries.customerAnti _),
    "q11_period_delta" -> (Queries.periodDelta _),
    "q12_stratified_sample" -> (Queries.stratifiedSample _),
    "q13_ad_blacklist" -> (Queries.adBlacklist _),
    "q14_ad_stats" -> (Queries.adStats _),
    "q15_province_top3_ads" -> (Queries.provinceTop3Ads _),
    "q16_click_trend" -> (Queries.clickTrend _)
  )

  def oracleSql: Map[String, String] = Oracles.sql
}

/** The query implementations (Spark side). Kept separate from the
  * contract object so tests can target them directly. */
object Queries {

  /** A4/A2-style grouped conditional aggregation on lineitem (TPC-H
    * Q1 shape). Decimal casts make the sums bit-exact vs the oracle. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** A1: gap-sessionized events → session-grain aggregates. */
  def sessionAggr(spark: SparkSession, dir: String): DataFrame =
    Sessionize(Tables(spark, dir, "events"))

  /** A2: one-row visit/step-length histogram with bp ratios. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    SessionStats(sessionAggr(spark, dir))

  /** P2 + J2: optional-predicate filter over sessions ⋈ user dim. */
  val filterParams: SessionFilter.Params = SessionFilter.Params(
    minAcctbal = Some(0.0),
    segments = Some(Seq("BUILDING", "AUTOMOBILE", "MACHINERY")),
    eventTypes = Some(Seq("purchase", "signup")))

  def sessionFilter(spark: SparkSession, dir: String): DataFrame =
    SessionFilter(sessionAggr(spark, dir), Tables(spark, dir, "customer"), filterParams)
      .select(
        col("session_id"), col("user_id"), col("c_mktsegment"),
        col("step_length"), col("visit_length_s"), col("event_types"))

  /** W3 + A4: top-10 categories by (click, purchase, view) counts. */
  def topCategories(spark: SparkSession, dir: String): DataFrame =
    TopK.topCategories(Tables(spark, dir, "events"))

  /** A9 + J6 + W4: top sessions per top category. */
  def topSessionsPerCategory(spark: SparkSession, dir: String): DataFrame =
    TopK.topSessionsPerCategory(
      Sessionize.assignSessions(Tables(spark, dir, "events")))

  val funnelFlow: Seq[String] = Seq("view", "click", "purchase")

  /** W5: page single-jump conversion funnel. */
  def pageFunnel(spark: SparkSession, dir: String): DataFrame =
    PageFunnel(spark,
      Sessionize.assignSessions(Tables(spark, dir, "events")), funnelFlow)

  /** W1 + A6/A7 + J7/J8 + F5: area top-3 hot products. */
  def areaTop3Products(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts(
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      Tables(spark, dir, "region"), Tables(spark, dir, "part"))

  /** J6: orders with a 1996 shipment, counted per priority. */
  def orderPrioritySemi(spark: SparkSession, dir: String): DataFrame = {
    val shipped96 = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey").as("o_orderkey"))
    Joins.semi(Tables(spark, dir, "orders"), shipped96, Seq("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** J9 (batch shape): customers with no URGENT order, per segment. */
  def customerAnti(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Joins.anti(Tables(spark, dir, "customer"), urgent, Seq("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customer_count"))
  }

  /** U1: first-half vs second-half January purchase delta per user. */
  def periodDelta(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
    val mid = lit("2024-01-16").cast("timestamp")
    PeriodDelta(purchases, "user_id", "value",
      col("ts") < mid, col("ts") >= mid)
  }

  /** R1: deterministic time-proportional stratified extraction.
    * Target 1000 = the reference README's figure (§六.3); the code's
    * 100 yields all-zero hour quotas on a 30-day x 24-hour grid. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    StratifiedExtract(sessionAggr(spark, dir), target = 1000L)

  private def adClicks(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.eventsAsAdClicks(
      Tables(spark, dir, "events"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "region"))

  /** T4: dynamic blacklist — users with >=2 clicks on one ad in a day. */
  def adBlacklist(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.blacklist(adClicks(spark, dir), threshold = 2L)

  /** T5: click totals per (day, province, city, ad). */
  def adStats(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.adStats(adClicks(spark, dir))

  /** T6/W2: per (day, province) top-3 ads — reference intent (<=3). */
  def provinceTop3Ads(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.provinceTopAds(adClicks(spark, dir))

  /** T7: per-minute counts over the trailing hour of the data. */
  def clickTrend(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.clickTrend(adClicks(spark, dir))
}

/** DuckDB oracle SQL, one per SQL-expressible query. Shares bucket
  * definitions with the Spark side via SessionStats.bucketSqlExprs. */
object Oracles {

  /** Gap sessionization as a reusable CTE body (DuckDB dialect).
    * `sz` = row-level events with session_id; `sess` = session grain. */
  val sessionCte: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value, props, ts, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events
      |), sz0 AS (
      |  SELECT *, SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |         OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM e
      |), sz AS (
      |  SELECT *, CAST(user_id AS VARCHAR) || '_' || CAST(session_seq AS VARCHAR) AS session_id
      |  FROM sz0
      |), sess AS (
      |  SELECT session_id,
      |         user_id,
      |         COUNT(*) AS step_length,
      |         (MAX(ts_us) - MIN(ts_us)) // 1000000 AS visit_length_s,
      |         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_time,
      |         string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
      |         SUM(CAST(value AS DECIMAL(18,2))) AS total_value
      |  FROM sz GROUP BY 1, 2
      |)""".stripMargin

  /** Events-as-ad-clicks (the q13-q16 input shape): click events with
    * ad_id from props, province/city from the geo dimension chain. */
  val adClickCte: String =
    """SELECT e.ts, r.r_name AS province, n.n_name AS city, e.user_id,
      |       CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS ad_id
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE e.event_type = 'click'
      |  AND json_extract_string(e.props, '$.k') IS NOT NULL""".stripMargin

  private val sessionStatsSql: String = {
    val buckets = graft.ops.SessionStats.bucketSqlExprs.mkString(",\n       ")
    val bp = graft.ops.SessionStats.bucketNames
      .map(n => s"CAST(FLOOR(10000.0 * $n / session_count) AS BIGINT) AS ${n}_bp")
      .mkString(",\n       ")
    s"""$sessionCte, h AS (
       |SELECT COUNT(*) AS session_count,
       |       $buckets
       |FROM sess)
       |SELECT session_count, ${graft.ops.SessionStats.bucketNames.mkString(", ")},
       |       $bp
       |FROM h""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |       SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_sessionize" -> s"$sessionCte SELECT * FROM sess",

    "q03_session_stats" -> sessionStatsSql,

    "q04_session_filter" ->
      s"""$sessionCte
         |SELECT s.session_id, s.user_id, c.c_mktsegment,
         |       s.step_length, s.visit_length_s, s.event_types
         |FROM sess s JOIN customer c ON s.user_id = c.c_custkey
         |WHERE c.c_acctbal >= 0.0
         |  AND c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
         |  AND list_has_any(string_split(s.event_types, ','), ['purchase', 'signup'])""".stripMargin,

    "q05_top_categories" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS category_id,
        |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_count
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY 1
        |ORDER BY click_count DESC, purchase_count DESC, view_count DESC, category_id ASC
        |LIMIT 10""".stripMargin,

    "q06_top_sessions_per_category" ->
      s"""$sessionCte, cat AS (
         |  SELECT *, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS category_id
         |  FROM sz WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |), top AS (
         |  SELECT category_id FROM cat GROUP BY 1
         |  ORDER BY CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) DESC,
         |           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) DESC,
         |           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) DESC,
         |           category_id ASC
         |  LIMIT 10
         |), ps AS (
         |  SELECT category_id, session_id, COUNT(*) AS click_count
         |  FROM cat WHERE event_type = 'click' GROUP BY 1, 2
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY category_id
         |                               ORDER BY click_count DESC, session_id ASC) AS rank
         |  FROM ps WHERE category_id IN (SELECT category_id FROM top)
         |)
         |SELECT category_id, session_id, click_count, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q07_page_funnel" -> {
      val flow = Queries.funnelFlow
      val splits = flow.sliding(2).map(p => s"${p(0)}_${p(1)}").toVector
      val values = splits.zipWithIndex
        .map { case (s, i) => s"('$s', CAST($i AS BIGINT))" }.mkString(", ")
      val inList = splits.map(s => s"'$s'").mkString(", ")
      s"""$sessionCte, pr AS (
         |  SELECT session_id, event_type,
         |         lag(event_type) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_type
         |  FROM sz
         |), pairs AS (
         |  SELECT prev_type || '_' || event_type AS split, COUNT(*) AS c
         |  FROM pr WHERE prev_type || '_' || event_type IN ($inList)
         |  GROUP BY 1
         |), steps AS (
         |  SELECT * FROM (VALUES $values) t(split, step_idx)
         |), j AS (
         |  SELECT s.step_idx, s.split, CAST(COALESCE(p.c, 0) AS BIGINT) AS split_count
         |  FROM steps s LEFT JOIN pairs p ON s.split = p.split
         |), f AS (
         |  SELECT j.*, COALESCE(lag(split_count) OVER (ORDER BY step_idx),
         |                       (SELECT COUNT(*) FROM sz WHERE event_type = '${flow.head}')) AS prev_count
         |  FROM j
         |)
         |SELECT step_idx, split, split_count, prev_count,
         |       CASE WHEN prev_count = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * split_count / prev_count) AS BIGINT) END AS convert_rate_bp
         |FROM f""".stripMargin
    },

    "q08_area_top3_products" ->
      """WITH geo AS (
        |  SELECT o.o_orderkey, n.n_nationkey, n.n_name, r.r_name AS area
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), clicks AS (
        |  SELECT g.area, g.n_nationkey, g.n_name, l.l_partkey AS product_id
        |  FROM lineitem l JOIN geo g ON l.l_orderkey = g.o_orderkey
        |), counted AS (
        |  SELECT area, product_id, COUNT(*) AS click_count,
        |         string_agg(DISTINCT CAST(n_nationkey AS VARCHAR) || ':' || n_name, ','
        |                    ORDER BY CAST(n_nationkey AS VARCHAR) || ':' || n_name) AS city_infos
        |  FROM clicks GROUP BY 1, 2
        |), wp AS (
        |  SELECT counted.*, p.p_name AS product_name,
        |         CASE WHEN p.p_size % 2 = 0 THEN 'Self' ELSE 'Third Party' END AS product_status
        |  FROM counted JOIN part p ON counted.product_id = p.p_partkey
        |), ranked AS (
        |  SELECT wp.*,
        |         CASE WHEN area IN ('ASIA', 'AMERICA') THEN 'A Level'
        |              WHEN area = 'EUROPE' THEN 'B Level'
        |              WHEN area = 'MIDDLE EAST' THEN 'C Level'
        |              ELSE 'D Level' END AS area_level,
        |         row_number() OVER (PARTITION BY area ORDER BY click_count DESC, product_id ASC) AS rank
        |  FROM wp
        |)
        |SELECT area, area_level, product_id, click_count, city_infos,
        |       product_name, product_status, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin,

    "q09_order_priority_semi" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |                AND l.l_shipdate < TIMESTAMP '1997-01-01')
        |GROUP BY 1""".stripMargin,

    "q10_customer_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS customer_count
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q11_period_delta" ->
      """WITH u AS (
        |  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v, CAST(1 AS BIGINT) AS sign
        |  FROM events WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
        |  UNION ALL
        |  SELECT user_id, CAST(value AS DECIMAL(18,2)), CAST(-1 AS BIGINT)
        |  FROM events WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
        |)
        |SELECT user_id, SUM(sign * v) AS value_delta, CAST(SUM(sign) AS BIGINT) AS count_delta
        |FROM u GROUP BY 1""".stripMargin,

    "q12_stratified_sample" ->
      s"""$sessionCte, k AS (
         |  SELECT session_id, start_time, event_types,
         |         substr(start_time, 1, 10) AS dt,
         |         substr(start_time, 1, 10) || '_' || substr(start_time, 12, 2) AS date_hour
         |  FROM sess
         |), nd AS (SELECT COUNT(DISTINCT dt) AS n_days FROM k
         |), r AS (
         |  SELECT k.*,
         |         COUNT(*) OVER (PARTITION BY date_hour) AS hour_count,
         |         COUNT(*) OVER (PARTITION BY dt) AS day_count,
         |         row_number() OVER (PARTITION BY date_hour
         |                            ORDER BY md5(session_id), session_id) AS pick
         |  FROM k
         |)
         |SELECT date_hour, session_id, start_time, event_types
         |FROM r, nd
         |WHERE pick <= (hour_count * (1000 // n_days)) // day_count""".stripMargin,

    "q13_ad_blacklist" ->
      s"""WITH ac AS ($adClickCte)
         |, counts AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id, ad_id, COUNT(*) AS click_count
         |  FROM ac GROUP BY 1, 2, 3
         |)
         |SELECT DISTINCT user_id FROM counts WHERE click_count >= 2""".stripMargin,

    "q14_ad_stats" ->
      s"""WITH ac AS ($adClickCte)
         |SELECT strftime(ts, '%Y-%m-%d') AS dt, province, city, ad_id,
         |       COUNT(*) AS click_count
         |FROM ac GROUP BY 1, 2, 3, 4""".stripMargin,

    "q15_province_top3_ads" ->
      s"""WITH ac AS ($adClickCte)
         |, per AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS dt, province, ad_id, COUNT(*) AS click_count
         |  FROM ac GROUP BY 1, 2, 3
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY dt, province
         |                               ORDER BY click_count DESC, ad_id ASC) AS rank
         |  FROM per
         |)
         |SELECT dt, province, ad_id, click_count, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q16_click_trend" ->
      s"""WITH ac AS ($adClickCte)
         |, m AS (SELECT max(ts) AS mx FROM ac)
         |SELECT strftime(ts, '%Y%m%d%H%M') AS minute_key, ad_id, COUNT(*) AS click_count
         |FROM ac, m
         |WHERE ts >= mx - INTERVAL 60 MINUTE
         |GROUP BY 1, 2""".stripMargin
  )
}
