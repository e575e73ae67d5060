package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Sessionize, SessionStats, SessionFilter}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String = "click", v: Double = 1.0) =
    (id, Timestamp.valueOf(t), user, typ, v, """{"k": 1}""")

  private lazy val tiny = Seq(
    ev(0, 1, "2024-01-01 00:00:00", "view"),
    ev(1, 1, "2024-01-01 00:10:00", "click"),
    ev(2, 1, "2024-01-01 00:39:00", "purchase", 5.5), // 29min gap: same session
    ev(3, 1, "2024-01-01 01:20:00", "view"), // 41min gap: NEW session
    ev(4, 2, "2024-01-01 00:00:00", "signup")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("assignSessions splits on >30min gap, per user") {
    val s = Sessionize.assignSessions(tiny)
    val byEvent = s.select("event_id", "session_id").as[(Long, String)].collect().toMap
    assert(byEvent(0L) == "1_1" && byEvent(1L) == "1_1" && byEvent(2L) == "1_1")
    assert(byEvent(3L) == "1_2")
    assert(byEvent(4L) == "2_1")
  }

  test("sessionAggregates computes lengths, start, sorted distinct types") {
    val agg = Sessionize(tiny).collect().map(r => r.getAs[String]("session_id") -> r).toMap
    val s11 = agg("1_1")
    assert(s11.getAs[Long]("step_length") == 3L)
    assert(s11.getAs[Long]("visit_length_s") == 39L * 60)
    assert(s11.getAs[String]("start_time") == "2024-01-01 00:00:00")
    assert(s11.getAs[String]("event_types") == "click,purchase,view")
    assert(s11.getAs[Long]("total_value_cents") == 750L) // 1.00+1.00+5.50 in cents
    assert(agg("1_2").getAs[Long]("visit_length_s") == 0L)
  }

  test("SessionStats buckets sum to session_count") {
    val stats = SessionStats(Queries.sessionAggr(spark, sf)).collect()(0)
    val n = stats.getAs[Long]("session_count")
    assert(n > 0)
    val visitSum = Seq("visit_1s_3s", "visit_4s_6s", "visit_7s_9s", "visit_10s_30s",
      "visit_30s_60s", "visit_1m_3m", "visit_3m_10m", "visit_10m_30m", "visit_30m_plus")
      .map(stats.getAs[Long](_)).sum
    // sessions with visit_length_s == 0 fall in no bucket (reference semantics)
    assert(visitSum <= n)
    val stepSum = Seq("step_1_3", "step_4_6", "step_7_9", "step_10_30", "step_30_60", "step_60_plus")
      .map(stats.getAs[Long](_)).sum
    assert(stepSum == n)
  }

  test("SessionFilter with no params passes everything") {
    val sess = Queries.sessionAggr(spark, sf)
    val cust = graft.tables.Tables(spark, sf, "customer")
    val all = SessionFilter(sess, cust, SessionFilter.Params())
    // inner join with dim may drop sessions whose user has no customer row
    assert(all.count() <= sess.count())
    val some = SessionFilter(sess, cust, Queries.filterParams)
    assert(some.count() <= all.count())
  }
}
