package graft

import org.apache.spark.sql.functions._

import graft.ops.{RefShape, SessionStats, Sessionize, StratifiedExtract, TopK}
import graft.tables.Tables

/** §1.3 answer-surface shapes: every reference result table's column
  * layout, produced from the engine's frames and writable through the
  * same sinks the reference used. */
class RefShapeSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")
  private lazy val sessionized = Sessionize.assignSessions(events)
  private lazy val sessions = Sessionize.sessionAggregates(sessionized)

  test("session_aggr_stat: taskid + count + 15 percent ratios, ratios = bp/100") {
    val out = RefShape.sessionAggrStat(SessionStats(sessions), taskId = 7L)
    assert(out.columns.toSeq ==
      "taskid" +: "session_count" +: SessionStats.bucketNames.map(_ + "_ratio"))
    val row = out.head()
    assert(row.getAs[Long]("taskid") == 7L)
    val r = row.getAs[Double]("visit_1s_3s_ratio")
    assert(r >= 0.0 && r <= 100.0)
    // two-decimal percent, exactly bp/100 (no extra rounding)
    assert((r * 100).round == (r * 100), s"not 2-decimal exact: $r")
  }

  test("session_random_extract + session_detail: sampled sessions and their action rows") {
    val extracted = StratifiedExtract(sessions, target = 50L)
    val ex = RefShape.sessionRandomExtract(extracted, 7L)
    assert(ex.columns.toSeq == Seq(
      "taskid", "sessionid", "start_time", "search_keywords", "click_category_ids"))
    // full DAO arity: action rows come from the user_visit_action
    // ingest adapter, so every SessionDetail.java column is real
    val actions = graft.ingest.UserVisitAction.fromEvents(events)
    val detail = RefShape.sessionDetail(actions, extracted, 7L)
    assert(detail.columns.toSeq == RefShape.sessionDetailColumns)
    assert(RefShape.sessionDetailColumns.size == 12) // taskid + 11 action cols
    // detail rows cover exactly the extracted sessions
    val detailSessions = detail.select(col("sessionid")).distinct().count()
    assert(detailSessions == extracted.count())
    // one-hot action families survive the semi-join untouched
    assert(detail.filter(col("search_keyword").isNotNull &&
      col("click_category_id").isNotNull).count() == 0L)
  }

  test("top10_category / top10_session: reference column names, task-scoped") {
    val cats = RefShape.top10Category(TopK.topCategories(events), 7L)
    assert(cats.columns.toSeq == Seq(
      "taskid", "categoryid", "clickCount", "orderCount", "payCount"))
    assert(cats.count() <= 10)
    val sess = RefShape.top10Session(
      TopK.topSessionsPerCategory(sessionized).drop("rank"), 7L)
    assert(sess.columns.toSeq == Seq(
      "taskid", "categoryid", "sessionid", "clickCount"))
  }

  test("page_split_convert_rate + area_top3_product shapes") {
    val rate = RefShape.pageSplitConvertRate(
      spark, sessionized, Seq("view", "click", "purchase"), 7L)
    assert(rate.columns.toSeq == Seq("taskid", "convert_rate"))
    assert(rate.head().getString(1).contains("="))

    val area = RefShape.areaTop3Product(Queries.areaTop3Products(spark, sf), 7L)
    assert(area.columns.toSeq == Seq("taskid", "area", "area_level", "product_id",
      "click_count", "city_infos", "product_name", "product_status"))
  }
}
