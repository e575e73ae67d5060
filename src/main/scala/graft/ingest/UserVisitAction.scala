package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Sessionize

/** Ingest adapter: the reference's `user_visit_action` input schema
  * over the driver's `events` analog.
  *
  * The reference's actual input table (MockData.java:87-100) is 13
  * columns — date, user_id, session_id, page_id, action_time,
  * search_keyword, click_category_id, click_product_id,
  * order_category_ids, order_product_ids, pay_category_ids,
  * pay_product_ids, city_id — where exactly one action family
  * (search / click / order / pay) is non-null per row and the
  * order/pay id cells are COMMA-JOINED lists (MockData.java:67-71).
  * Every session-analysis query consumes this shape, so "switch
  * engines without touching anything else" needs the input edge, not
  * just the output shapes (RefShape covers those).
  *
  * `fromEvents` is the ETL: a deterministic, SQL-expressible mapping
  * from the events log (event_id, ts, user_id, event_type, value,
  * props) onto the action schema. The event-kind mapping
  * (view→search, click→click, purchase→order, signup→pay, error→bare
  * page view) and the derived id arithmetic are demo config — any
  * deployment maps its own log kinds — but the schema, the one-hot
  * action families, and the comma-list cells are the reference's
  * contract, and that's what the oracle checks row-by-row.
  *
  * Scale shape: pure per-row projection over the event scan (no
  * shuffle) except session_id, which reuses the gap sessionizer's
  * single user_id window shuffle (Sessionize.assignSessions).
  */
object UserVisitAction {

  /** The reference DAO's column order (MockData.java:87-100 /
    * SessionDetail.java:9-20 minus taskid). */
  val columns: Seq[String] = Seq(
    "date", "user_id", "session_id", "page_id", "action_time",
    "search_keyword", "click_category_id", "click_product_id",
    "order_category_ids", "order_product_ids",
    "pay_category_ids", "pay_product_ids", "city_id")

  /** events analog → 13-column user_visit_action frame.
    * One row per event; one non-null action family per row (P4's
    * precondition). Comma-list cells use three deterministic derived
    * ids so multi-valued explode paths are genuinely exercised. */
  def fromEvents(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    def idList(mults: (Int, Int)*) = concat_ws(",",
      (lit(k) +: mults.map { case (m, a) => (k * m + a) % 100 }): _*)
    def prodList(mults: (Int, Int)*) = concat_ws(",",
      mults.map { case (m, a) => (k * m + a) % 1000 }: _*)
    Sessionize.assignSessions(events, gapSeconds)
      .withColumn("k", k)
      .select(
        date_format(col("ts"), "yyyy-MM-dd").as("date"),
        col("user_id"),
        col("session_id"),
        (col("event_id") % 100).as("page_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("action_time"),
        when(col("event_type") === "view",
          concat(lit("kw_"), col("k"))).as("search_keyword"),
        when(col("event_type") === "click", col("k")).as("click_category_id"),
        when(col("event_type") === "click", (col("k") * 131) % 1000)
          .as("click_product_id"),
        when(col("event_type") === "purchase", idList((7, 11), (13, 17)))
          .as("order_category_ids"),
        when(col("event_type") === "purchase", prodList((131, 0), (37, 41)))
          .as("order_product_ids"),
        when(col("event_type") === "signup", idList((3, 5)))
          .as("pay_category_ids"),
        when(col("event_type") === "signup", prodList((131, 0)))
          .as("pay_product_ids"),
        (col("user_id") % 10).as("city_id"))
  }

  /** P4: the mixed click+order+pay category explode
    * (UserVisitSessionAnalyzeSpark.java:1337-1372) — one row per
    * (action row, category id) with the action kind. Comma cells are
    * split+exploded; the three branches are a unionByName of slim
    * two-column projections, so the whole thing is map-side only. */
  def categoryActions(actions: DataFrame): DataFrame = {
    def exploded(cell: String, kind: String) = actions
      .filter(col(cell).isNotNull)
      .select(explode(split(col(cell), ",")).as("cat"), lit(kind).as("kind"))
      .select(col("cat").cast("long").as("category_id"), col("kind"))
    actions
      .filter(col("click_category_id").isNotNull)
      .select(col("click_category_id").as("category_id"), lit("click").as("kind"))
      .unionByName(exploded("order_category_ids", "order"))
      .unionByName(exploded("pay_category_ids", "pay"))
  }

  /** The reference's top10_category surface (A4+W3) over the mapped
    * schema: per-category click/order/pay counts, reference ordering
    * (click desc, order desc, pay desc) with an id tie-break. */
  def topCategories(actions: DataFrame, n: Int = 10): DataFrame =
    categoryActions(actions)
      .groupBy(col("category_id"))
      .agg(
        sum(when(col("kind") === "click", 1L).otherwise(0L)).as("click_count"),
        sum(when(col("kind") === "order", 1L).otherwise(0L)).as("order_count"),
        sum(when(col("kind") === "pay", 1L).otherwise(0L)).as("pay_count"))
      .orderBy(col("click_count").desc, col("order_count").desc,
        col("pay_count").desc, col("category_id").asc)
      .limit(n)
}
