package graft

import org.apache.spark.sql.functions._

import graft.ingest.UserVisitAction
import graft.tables.Tables

/** Ingest adapter: events analog → the reference's 13-column
  * user_visit_action schema, and the P4 mixed category explode. */
class IngestSpec extends SparkSpec {

  private lazy val actions =
    UserVisitAction.fromEvents(Tables(spark, sf, "events"))

  test("emits the reference's exact 13-column order (MockData.java:87-100)") {
    assert(actions.columns.toSeq == UserVisitAction.columns)
  }

  test("one-hot action families: exactly one family non-null per mapped row") {
    val fam = actions.select(
      (col("search_keyword").isNotNull.cast("int") +
        col("click_category_id").isNotNull.cast("int") +
        col("order_category_ids").isNotNull.cast("int") +
        col("pay_category_ids").isNotNull.cast("int")).as("n"))
    // error events map to a bare page view (0 families); all other
    // kinds map to exactly one — never two
    assert(fam.filter(col("n") > 1).count() == 0L)
    assert(fam.filter(col("n") === 1).count() > 0L)
  }

  test("P4 explode: a purchase row yields 3 order categories, a signup row 2 pay categories") {
    val cats = UserVisitAction.categoryActions(actions)
    val byKind = cats.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase").count()
    val signups = ev.filter(col("event_type") === "signup").count()
    val clicks = ev.filter(col("event_type") === "click").count()
    assert(byKind("order") == purchases * 3)
    assert(byKind("pay") == signups * 2)
    assert(byKind("click") == clicks)
  }

  test("session ids agree with the gap sessionizer (same assignment rule as q02)") {
    val fromAdapter = actions.select("session_id").distinct().count()
    val fromSessionize = graft.ops.Sessionize(Tables(spark, sf, "events")).count()
    assert(fromAdapter == fromSessionize)
  }

  test("topCategories: category counting is map-side until the single aggregate shuffle") {
    val p = UserVisitAction.topCategories(actions)
      .queryExecution.executedPlan.toString
    // budget: the sessionizer's user_id window shuffle + the category
    // aggregate (+ the top-N TakeOrdered single-partition exchange);
    // no shuffle may appear between explode branches and the aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p)
  }
}
