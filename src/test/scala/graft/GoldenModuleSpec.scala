package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ops.{RefShape, SessionFilter, SessionStats, Sessionize,
  StratifiedExtract, TopK}
import graft.sink.{InMemoryProvider, InMemoryStore}

/** The reference's full session-analysis module lifecycle
  * (UserVisitSessionAnalyzeSpark.main:57-238) as ONE golden test:
  * seeded input → sessionize → aggregate → task-param filter →
  * stats histogram → stratified extract → detail semi-join →
  * top-10 categories → top-10 sessions per category → every result
  * table written through the §1.3 KeyedStore sink surface — and every
  * sunk table compared cell-for-cell against hand-derived golden
  * rows. RefShapeSpec pins each table's SHAPE individually; this spec
  * pins the MODULE: that the composed pipeline, run end to end
  * through the real sinks, lands exactly the rows the reference's
  * DAO writers would.
  *
  * Sink conventions (the reference's five DAO writers, mapped onto
  * the one keyed model): full-arity rows sink as string key tuples
  * (insertKey — insert-if-absent, like the detail/extract inserts);
  * the aggr-stat row sinks metric-per-key (put); the two top-10
  * tables sink via replaceGroup under the taskid prefix — the
  * delete-by-task + insert a re-run of the same task performs. */
class GoldenModuleSpec extends SparkSpec {
  import spark.implicits._

  private val TaskId = 7L

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Seeded MockData-analog fixture (events schema — the module's
    * input edge; UserVisitAction.fromEvents is the declared ETL onto
    * the reference's 13-column action schema). Four users, five
    * gap-separated sessions on 2024-03-01; every action family
    * (view→search, click, purchase→order, signup→pay) appears. */
  private lazy val events = Seq(
    // u1 session 1: view, click, purchase of category 5 (60 s, 3 steps)
    (1L, ts("2024-03-01 10:00:00"), 1L, "view", 0.0, """{"k":5}"""),
    (2L, ts("2024-03-01 10:00:30"), 1L, "click", 0.0, """{"k":5}"""),
    (3L, ts("2024-03-01 10:01:00"), 1L, "purchase", 12.34, """{"k":5}"""),
    // u1 session 2 (>30 min later): lone view of category 7
    (4L, ts("2024-03-01 12:00:00"), 1L, "view", 0.0, """{"k":7}"""),
    // u2: two clicks — filtered OUT by the dim predicate below
    (5L, ts("2024-03-01 10:00:00"), 2L, "click", 0.0, """{"k":5}"""),
    (6L, ts("2024-03-01 10:00:10"), 2L, "click", 0.0, """{"k":6}"""),
    // u3 session 1: click, click, purchase of category 6 (370 s)
    (7L, ts("2024-03-01 11:00:00"), 3L, "click", 0.0, """{"k":6}"""),
    (8L, ts("2024-03-01 11:03:05"), 3L, "click", 0.0, """{"k":6}"""),
    (9L, ts("2024-03-01 11:06:10"), 3L, "purchase", 50.0, """{"k":6}"""),
    // u4 session 1: view then signup of category 9 (20 s)
    (10L, ts("2024-03-01 09:30:00"), 4L, "view", 0.0, """{"k":9}"""),
    (11L, ts("2024-03-01 09:30:20"), 4L, "signup", 0.0, """{"k":9}"""))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private lazy val customer = Seq(
    (1L, 500.0, "BUILDING", 1),
    (2L, 100.0, "AUTOMOBILE", 2), // fails BOTH criteria
    (3L, 900.0, "BUILDING", 1),
    (4L, 700.0, "BUILDING", 3))
    .toDF("c_custkey", "c_acctbal", "c_mktsegment", "c_nationkey")

  /** Executor-side sink of full-arity rows: every cell stringified
    * into the key tuple (nulls as ""), one store handle per partition
    * — the T9 pooled-DAO write shape. */
  private def sinkRows(df: DataFrame, store: String, table: String): Unit = {
    val provider = InMemoryProvider(store)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val st = provider.open()
      try rows.foreach { r =>
        st.insertKey(table,
          (0 until r.length).map(i =>
            if (r.isNullAt(i)) "" else r.get(i).toString))
      } finally st.close()
    }
  }

  test("session-analysis module: lifecycle end-to-end, all five sunk tables golden") {
    val store = "golden_module"
    InMemoryStore.clear(store)

    // — the reference main's step order —
    val sessionized = Sessionize.assignSessions(events)
    val sessions = Sessionize.sessionAggregates(sessionized)
    val filtered = SessionFilter(sessions, customer,
      SessionFilter.Params(minAcctbal = Some(200.0),
        segments = Some(Seq("BUILDING"))))
      .persist()
    val stats = SessionStats(filtered)
    val extracted = StratifiedExtract(filtered, target = 100L)
    val actions = graft.ingest.UserVisitAction.fromEvents(events)
    val detail = RefShape.sessionDetail(actions, extracted, TaskId)
    // top-10s run over the FILTERED sessions' detail (reference
    // passes sessionid2detailRDD): restrict the sessionized events
    val filteredEvents = sessionized.join(
      broadcast(filtered.select(col("session_id"))), Seq("session_id"),
      "left_semi")
    val topCats = TopK.topCategories(filteredEvents)
    val topSess = TopK.topSessionsPerCategory(filteredEvents)

    // — the five sinks —
    val aggrStat = RefShape.sessionAggrStat(stats, TaskId)
    val statRow = aggrStat.head()
    locally { // metric-per-key puts (ratio percents land as 100× longs)
      val st = new InMemoryStore(store)
      try aggrStat.columns.foreach { c =>
        val v = statRow.get(statRow.fieldIndex(c)) match {
          case d: Double => math.round(d * 100.0)
          case l: Long => l
          case x => x.toString.toLong
        }
        st.put("session_aggr_stat", Seq(TaskId.toString, c), v)
      } finally st.close()
    }
    sinkRows(RefShape.sessionRandomExtract(extracted, TaskId),
      store, "session_random_extract")
    sinkRows(detail, store, "session_detail")
    locally { // re-runnable task rows: delete-by-task + insert
      val st = new InMemoryStore(store)
      try {
        st.replaceGroup("top10_category", Seq(TaskId.toString),
          RefShape.top10Category(topCats, TaskId).collect().toSeq.map(r =>
            (Seq(TaskId.toString, r.getAs[Long]("categoryid").toString),
              r.getAs[Long]("clickCount"))))
        st.replaceGroup("top10_session", Seq(TaskId.toString),
          RefShape.top10Session(topSess.drop("rank"), TaskId).collect()
            .toSeq.map(r =>
              (Seq(TaskId.toString, r.getAs[Long]("categoryid").toString,
                r.getAs[String]("sessionid")),
                r.getAs[Long]("clickCount"))))
      } finally st.close()
    }

    // — golden comparison, hand-derived from the fixture —
    val st = new InMemoryStore(store)
    def scan(t: String) = st.scan(t).map { case (k, v) => (k, v) }.toSet

    // filtered sessions: 1_1 (60s, 3 steps), 1_2 (0s, 1), 3_1 (370s,
    // 3), 4_1 (20s, 2); u2 fails acctbal AND segment. Buckets:
    // visit 10s_30s=1 (20s), 30s_60s=1 (60s), 3m_10m=1 (370s); the
    // 0-second session falls in NO visit bucket (reference edge);
    // steps: all four in step_1_3.
    val zeroes = SessionStats.bucketNames
      .filterNot(Set("visit_10s_30s", "visit_30s_60s", "visit_3m_10m",
        "step_1_3"))
      .map(n => (List("7", s"${n}_ratio"), 0L))
    assert(scan("session_aggr_stat") == (Set(
      (List("7", "taskid"), 7L),
      (List("7", "session_count"), 4L),
      (List("7", "visit_10s_30s_ratio"), 2500L), // 25.00 %
      (List("7", "visit_30s_60s_ratio"), 2500L),
      (List("7", "visit_3m_10m_ratio"), 2500L),
      (List("7", "step_1_3_ratio"), 10000L)) ++ zeroes))

    // quota 100 over 4 sessions → every filtered session extracted
    assert(scan("session_random_extract") == Set(
      (List("7", "1_1", "2024-03-01 10:00:00",
        "click,purchase,view", "click,purchase,view"), 0L),
      (List("7", "1_2", "2024-03-01 12:00:00", "view", "view"), 0L),
      (List("7", "3_1", "2024-03-01 11:00:00",
        "click,purchase", "click,purchase"), 0L),
      (List("7", "4_1", "2024-03-01 09:30:00",
        "signup,view", "signup,view"), 0L)))

    // detail: the 9 actions of the extracted sessions at full DAO
    // arity. fromEvents id arithmetic: click/order product =
    // (k·131)%1000; order cats = k,(7k+11)%100,(13k+17)%100; order
    // prods = (131k)%1000,(37k+41)%1000; pay cats = k,(3k+5)%100;
    // pay prods = (131k)%1000; page_id = event_id%100.
    def d(cells: String*) = (List("7") ++ cells, 0L)
    assert(scan("session_detail") == Set(
      d("1", "1_1", "1", "2024-03-01 10:00:00", "kw_5", "", "", "", "", "", ""),
      d("1", "1_1", "2", "2024-03-01 10:00:30", "", "5", "655", "", "", "", ""),
      d("1", "1_1", "3", "2024-03-01 10:01:00", "", "", "",
        "5,46,82", "655,226", "", ""),
      d("1", "1_2", "4", "2024-03-01 12:00:00", "kw_7", "", "", "", "", "", ""),
      d("3", "3_1", "7", "2024-03-01 11:00:00", "", "6", "786", "", "", "", ""),
      d("3", "3_1", "8", "2024-03-01 11:03:05", "", "6", "786", "", "", "", ""),
      d("3", "3_1", "9", "2024-03-01 11:06:10", "", "", "",
        "6,53,95", "786,263", "", ""),
      d("4", "4_1", "10", "2024-03-01 09:30:00", "kw_9", "", "", "", "", "", ""),
      d("4", "4_1", "11", "2024-03-01 09:30:20", "", "", "", "", "",
        "9,32", "179")))

    // categories over filtered events: 6→(2 clicks,1 order,0 views),
    // 5→(1,1,1), 7→(0,0,1), 9→(0,0,1); stored value = clickCount
    assert(scan("top10_category") == Set(
      (List("7", "5"), 1L), (List("7", "6"), 2L),
      (List("7", "7"), 0L), (List("7", "9"), 0L)))

    // per-category top sessions by clicks: cat 5 ← 1_1 (1 click),
    // cat 6 ← 3_1 (2 clicks); view/signup-only categories have none
    assert(scan("top10_session") == Set(
      (List("7", "5", "1_1"), 1L), (List("7", "6", "3_1"), 2L)))

    st.close()
    filtered.unpersist()
    InMemoryStore.clear(store)
  }
}
