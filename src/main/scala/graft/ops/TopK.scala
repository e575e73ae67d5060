package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N ranking operators.
  *
  * Reference semantics:
  *  - W3 (UserVisitSessionAnalyzeSpark.java:1403-1457 + the custom
  *    `Ordered` key CategorySortKey.java:20-107): top-10 categories by
  *    (click, order, pay) counts via secondary-sort + take(10). Here a
  *    single conditional aggregation + multi-column orderBy + limit —
  *    no custom key class, no sortByKey shuffle of the full data (only
  *    the grouped aggregate, already tiny, is sorted).
  *  - J5 (:1700-1790): the reference left-joins the category universe
  *    against 3 separately-computed count RDDs with Optional-default-0;
  *    conditional aggregation makes those joins unnecessary — one pass.
  *  - W4 (:1874-1944, with its array-bounds/NPE bugs — we implement the
  *    documented intent): per top category, top-K sessions by click
  *    count via row_number window.
  *
  * Scale: the category aggregate shuffles once on category_id (partial
  * agg map-side). The per-category session count shuffles on
  * (category_id, session_id). The top-categories frame is N rows —
  * broadcast-joined (semi) against the session counts, so no second
  * full shuffle. Skew on a hot category is absorbed by the partial
  * aggregation; AQE handles residual join skew.
  */
object TopK {

  /** Extract the category id from the events `props` JSON (F2:
    * get_json_object analog — built-in, codegen'd). */
  def withCategory(events: DataFrame): DataFrame =
    events
      .withColumn("category_id", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("category_id").isNotNull)

  /** W3: top-N categories by (click, purchase, view) conditional
    * counts, id tie-break. */
  def topCategories(events: DataFrame, n: Int = 10): DataFrame =
    withCategory(events)
      .groupBy(col("category_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_count"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase_count"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("view_count"))
      .orderBy(
        col("click_count").desc, col("purchase_count").desc,
        col("view_count").desc, col("category_id").asc)
      .limit(n)

  /** A9 + J6 + W4: for each top-N category, the top-K sessions by
    * click count (deterministic session_id tie-break). `sessionized`
    * = Sessionize.assignSessions output. */
  def topSessionsPerCategory(
      sessionized: DataFrame, nCategories: Int = 10, kSessions: Int = 10): DataFrame = {
    val clicks = withCategory(sessionized).filter(col("event_type") === "click")
    // user_id rides in the grouping key so hashpartitioning(user_id) —
    // already established by the assignSessions window — satisfies the
    // aggregate's distribution and the click stream is NOT re-shuffled
    // on (category_id, session_id). Semantics unchanged: session_id is
    // user-prefixed (`<user>_<seq>`), so it determines user_id. Same
    // subset-clustering trick as q02/q90/q91; PlanAuditSpec pins the
    // shuffle count.
    val perSession = clicks
      .groupBy(col("category_id"), col("session_id"), col("user_id"))
      .agg(count(lit(1)).as("click_count"))
      .drop("user_id")
    val top = topCategories(sessionized, nCategories).select("category_id")
    val w = Window.partitionBy(col("category_id"))
      .orderBy(col("click_count").desc, col("session_id").asc)
    perSession
      .join(broadcast(top), Seq("category_id"), "left_semi")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kSessions)
  }
}
