package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ANSWER SURFACE: its MySQL result-table rows
  * (SURVEY.md §1.3), produced from this engine's analytical frames.
  * A user of the reference switches engines by pointing these at the
  * same sink (`sources/Jdbc.append` or `sink/KeyedStore`) — column
  * names, shapes, and the task-scoping column match the reference's
  * DAO writers; only the engine underneath changed.
  *
  * Mapping notes:
  *  - `taskid` scopes every row, as the reference's DAOs insert it
  *    (domain/SessionAggrStat.java:8, Top10Category.java:5, ...).
  *  - The reference stores ratios as HALF_UP-rounded percent doubles
  *    (NumberUtils.java:19-22). Our histogram emits exact integer
  *    basis points; `bp / 100.0` IS the percent at 2 decimals, with
  *    no further rounding needed (floor-derived, two decimal digits).
  *  - Columns that exist only in the reference's event schema
  *    (search_keyword, click_category_id over the driver's events
  *    table) map to their analogs (event_types, category from props);
  *    the SHAPE (names, arity, types) is what downstream consumers
  *    key on.
  */
object RefShape {

  /** session_aggr_stat (SessionAggrStat.java:8-24): one row per task —
    * session_count + 15 ratio columns, percent doubles. */
  def sessionAggrStat(stats: DataFrame, taskId: Long): DataFrame = {
    val ratioCols = SessionStats.bucketNames.map(n =>
      (col(s"${n}_bp") / 100.0).as(s"${n}_ratio"))
    stats.select(lit(taskId).as("taskid") +: col("session_count") +: ratioCols: _*)
  }

  /** session_random_extract (SessionRandomExtract.java:5-9). */
  def sessionRandomExtract(extracted: DataFrame, taskId: Long): DataFrame =
    extracted.select(
      lit(taskId).as("taskid"),
      col("session_id").as("sessionid"),
      col("start_time"),
      col("event_types").as("search_keywords"), // analog column (see scaladoc)
      col("event_types").as("click_category_ids"))

  /** The session_detail DAO's exact column list (SessionDetail.java:
    * 9-20): taskid + the 11 action columns its insert writes. */
  val sessionDetailColumns: Seq[String] = Seq(
    "taskid", "userid", "sessionid", "pageid", "action_time",
    "search_keyword", "click_category_id", "click_product_id",
    "order_category_ids", "order_product_ids",
    "pay_category_ids", "pay_product_ids")

  /** session_detail (SessionDetail.java:9-20): full action rows of the
    * extracted sessions — the J6 semi-join the reference runs after
    * sampling — at the DAO's full arity. Takes a frame in the
    * reference's user_visit_action schema (see
    * graft.ingest.UserVisitAction.fromEvents for the events-log
    * mapping); every DAO column is populated, none faked. */
  def sessionDetail(actions: DataFrame, extracted: DataFrame,
      taskId: Long): DataFrame =
    Joins.semi(actions, extracted.select(col("session_id")), Seq("session_id"))
      .select(
        lit(taskId).as("taskid"),
        col("user_id").as("userid"),
        col("session_id").as("sessionid"),
        col("page_id").as("pageid"),
        col("action_time"),
        col("search_keyword"),
        col("click_category_id"),
        col("click_product_id"),
        col("order_category_ids"),
        col("order_product_ids"),
        col("pay_category_ids"),
        col("pay_product_ids"))

  /** top10_category (Top10Category.java:5-9). */
  def top10Category(topCats: DataFrame, taskId: Long): DataFrame =
    topCats.select(
      lit(taskId).as("taskid"),
      col("category_id").as("categoryid"),
      col("click_count").as("clickCount"),
      col("purchase_count").as("orderCount"),
      col("view_count").as("payCount"))

  /** top10_session (Top10Session.java:5-8). */
  def top10Session(topSessions: DataFrame, taskId: Long): DataFrame =
    topSessions.select(
      lit(taskId).as("taskid"),
      col("category_id").as("categoryid"),
      col("session_id").as("sessionid"),
      col("click_count").as("clickCount"))

  /** page_split_convert_rate (PageSplitConvertRate.java:5-6): ONE row,
    * the packed `split=rate|...` string. */
  def pageSplitConvertRate(spark: SparkSession, sessionized: DataFrame,
      flow: Seq[String], taskId: Long): DataFrame =
    PageFunnel.packed(spark, sessionized, flow)
      .select(lit(taskId).as("taskid"), col("convert_rate"))

  /** area_top3_product (AreaTop3Product.java:8-15). */
  def areaTop3Product(areaTop: DataFrame, taskId: Long): DataFrame =
    areaTop.select(
      lit(taskId).as("taskid"),
      col("area"),
      col("area_level"),
      col("product_id"),
      col("click_count"),
      col("city_infos"),
      col("product_name"),
      col("product_status"))
}
