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
    "q04_session_filter" -> (Queries.sessionFilter _)
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
}

/** DuckDB oracle SQL, one per SQL-expressible query. Shares bucket
  * definitions with the Spark side via SessionStats.bucketSqlExprs. */
object Oracles {

  /** Gap sessionization as a reusable CTE body (DuckDB dialect). */
  val sessionCte: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value, ts, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events
      |), sz AS (
      |  SELECT *, SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |         OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM e
      |), sess AS (
      |  SELECT CAST(user_id AS VARCHAR) || '_' || CAST(session_seq AS VARCHAR) AS session_id,
      |         user_id,
      |         COUNT(*) AS step_length,
      |         (MAX(ts_us) - MIN(ts_us)) // 1000000 AS visit_length_s,
      |         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_time,
      |         string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
      |         SUM(CAST(value AS DECIMAL(18,2))) AS total_value
      |  FROM sz GROUP BY 1, 2
      |)""".stripMargin

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
         |  AND list_has_any(string_split(s.event_types, ','), ['purchase', 'signup'])""".stripMargin
  )
}
