package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends SparkSpec {

  /** JVM-side recompute of Experiment.armCol's md5 draw (one copy for
    * every experiment-op test — the convention lives here and in the
    * operator only). */
  private def armOf(u: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(h, 16) % 100 < 50) "A" else "B"
  }
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String, k: Int) =
    (id, Timestamp.valueOf(t), user, typ, 1.0, s"""{"k": $k}""")

  test("topCategories orders by click, purchase, view with id tie-break") {
    val df = Seq(
      ev(0, 1, "2024-01-01 00:00:00", "click", 7),
      ev(1, 1, "2024-01-01 00:01:00", "click", 7),
      ev(2, 1, "2024-01-01 00:02:00", "click", 3),
      ev(3, 1, "2024-01-01 00:03:00", "purchase", 3),
      ev(4, 1, "2024-01-01 00:04:00", "click", 5),
      ev(5, 1, "2024-01-01 00:05:00", "purchase", 5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = TopK.topCategories(df, 3).select("category_id").as[Long].collect()
    // 7 has 2 clicks; 3 and 5 tie on clicks=1,purchase=1,view=0 → id asc
    assert(got.toSeq == Seq(7L, 3L, 5L))
  }

  test("topSessionsPerCategory ranks within category deterministically") {
    val df = Seq(
      ev(0, 1, "2024-01-01 00:00:00", "click", 1),
      ev(1, 1, "2024-01-01 00:01:00", "click", 1),
      ev(2, 2, "2024-01-01 00:00:00", "click", 1),
      ev(3, 3, "2024-01-01 00:00:00", "click", 2)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Sessionize.assignSessions(df)
    val got = TopK.topSessionsPerCategory(s, 10, 1)
      .select("category_id", "session_id", "click_count")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "1_1", 2L), (2L, "3_1", 1L)))
  }

  test("pageFunnel chains conversion rates with zero-PV guard") {
    val df = Seq(
      ev(0, 1, "2024-01-01 00:00:00", "view", 1),
      ev(1, 1, "2024-01-01 00:01:00", "click", 1),
      ev(2, 1, "2024-01-01 00:02:00", "purchase", 1),
      ev(3, 2, "2024-01-01 00:00:00", "view", 1),
      ev(4, 2, "2024-01-01 00:01:00", "view", 1)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Sessionize.assignSessions(df)
    val got = PageFunnel(spark, s, Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .select("split", "split_count", "prev_count", "convert_rate_bp")
      .as[(String, Long, Long, Long)].collect()
    // 3 view events; 1 view_click; 1 click_purchase
    assert(got(0) == ("view_click", 1L, 3L, 3333L))
    assert(got(1) == ("click_purchase", 1L, 1L, 10000L))
    // zero-PV guard: a flow that never starts
    val none = PageFunnel(spark, s, Seq("signup", "error"))
      .select("convert_rate_bp").as[Long].collect()
    assert(none.toSeq == Seq(0L))
  }

  test("areaTop3Products emits <=3 per area with rank tie-break") {
    val got = Queries.areaTop3Products(spark, sf)
    val perArea = got.groupBy("area").count().select("count").as[Long].collect()
    assert(perArea.forall(_ <= 3))
    val ranks = got.select("rank").distinct().as[Int].collect().sorted
    assert(ranks.forall(_ <= 3))
    // city_infos is sorted distinct
    val ci = got.select("city_infos").as[String].head()
    val toks = ci.split(",").toSeq
    assert(toks == toks.sorted && toks.distinct == toks)
  }

  test("stratified sample respects per-stratum quota and determinism") {
    val sess = Queries.sessionAggr(spark, sf)
    val a = StratifiedExtract(sess, 1000L).collect().map(_.toString).sorted
    val b = StratifiedExtract(sess, 1000L).collect().map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b))
    // quota never exceeds stratum size: pick<=quota<=hour_count by construction;
    // sampled strata are a subset of all strata
    val strata = StratifiedExtract(sess, 1000L).groupBy("date_hour").count()
    val sizes = sess.withColumn("date_hour",
        concat(substring(col("start_time"), 1, 10), lit("_"), substring(col("start_time"), 12, 2)))
      .groupBy("date_hour").count().withColumnRenamed("count", "total")
    val joined = strata.join(sizes, "date_hour")
      .filter(col("count") > col("total")).count()
    assert(joined == 0L)
  }

  test("PeriodDelta +1/-1 union computes signed sums") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), 10.0),
      (1L, Timestamp.valueOf("2024-01-20 00:00:00"), 4.0),
      (2L, Timestamp.valueOf("2024-01-21 00:00:00"), 3.0)
    ).toDF("user_id", "ts", "value")
    val mid = lit("2024-01-16").cast("timestamp")
    val got = PeriodDelta(df, "user_id", "value", col("ts") < mid, col("ts") >= mid)
      .orderBy("user_id")
      .select(col("user_id"), col("value_delta_cents"), col("count_delta"))
      .as[(Long, Long, Long)].collect()
    assert(got(0) == ((1L, 600L, 0L)))
    assert(got(1) == ((2L, -300L, -1L)))
  }

  test("erasureAudit cascades deny → customer → orders → lineitem → events") {
    val s = spark
    import s.implicits._
    val deny = Seq(1L).toDF("user_id")
    val customer = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1), (10L, 2), (11L, 1))
      .toDF("l_orderkey", "l_linenumber")
    val events = Seq((100L, 1L), (101L, 2L), (102L, 2L))
      .toDF("event_id", "user_id")
    val got = graft.ops.Erasure
      .erasureAudit(deny, customer, orders, lineitem, events)
      .collect().map(r => r.getAs[String]("table_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_affected"),
          r.getAs[Long]("affected_bp")))).toMap
    assert(got("customer") == ((2L, 1L, 5000L)))
    assert(got("orders") == ((2L, 1L, 5000L)))
    assert(got("lineitem") == ((3L, 2L, 6666L))) // order 10's two lines
    assert(got("events") == ((3L, 1L, 3333L)))
  }

  test("localSupplierRevenue: only local-supplier lineitems in-region and in-year count") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val region = Seq((1, "ASIA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "JAPAN", 1), (11, "CHINA", 1), (20, "FRANCE", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((100L, 10), (101L, 20)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((7L, 10), (8L, 11)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq(
      (1000L, 100L, ts("1996-05-01")), // in year, ASIA customer
      (1001L, 100L, ts("1994-01-01")), // out of year
      (1002L, 101L, ts("1996-05-01"))) // EUROPE customer
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (1000L, 7L, 10.0, 0.1),  // local supplier (JAPAN=JAPAN): counts, 900c
      (1000L, 8L, 10.0, 0.0),  // CHINA supplier for JAPAN customer: not local
      (1001L, 7L, 99.0, 0.0),  // out-of-year order
      (1002L, 7L, 99.0, 0.0))  // out-of-region customer
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = graft.ops.AreaTopProducts.localSupplierRevenue(
      lineitem, orders, customer, supplier, nation, region,
      "ASIA", "1996-01-01", "1997-01-01")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("JAPAN", 900L, 1L)))
  }

  test("shippingPriority: segment + both date gates bind; revenue is exact cents; top-k order") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val customer = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1997-06-01"), "1-URGENT"),   // qualifies
      (11L, 1L, ts("1998-02-01"), "2-HIGH"),     // ordered after cutoff
      (12L, 2L, ts("1997-06-01"), "3-MEDIUM"))   // wrong segment
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (10L, 10.0, 0.1, ts("1998-03-01")),  // ships after cutoff: 900c
      (10L, 5.0, 0.0, ts("1998-03-02")),   // 500c → order 10 = 1400c
      (10L, 99.0, 0.0, ts("1997-07-01")),  // shipped before cutoff
      (11L, 99.0, 0.0, ts("1998-03-01")),  // order gated out
      (12L, 99.0, 0.0, ts("1998-03-01")))  // segment gated out
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    val out = graft.ops.AreaTopProducts.shippingPriority(
      lineitem, orders, customer, "BUILDING", "1998-01-01")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(out == Seq((10L, 1400L, "1997-06-01", "1-URGENT")))
  }

  test("entryExit: first/last by (ts, id); single-event session bounces; type-grain merge") {
    val s = spark
    import s.implicits._
    def e(id: Long, u: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, 0.0, "{}")
    val events = Seq(
      e(1, 1, "2024-01-01 00:00:00", "view"),    // session 1_1: view→click
      e(2, 1, "2024-01-01 00:05:00", "click"),
      e(3, 1, "2024-01-01 10:00:00", "view"),    // session 1_2: bounce
      e(4, 2, "2024-01-01 00:00:00", "click"))   // session 2_1: bounce
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Sessionize.entryExit(events)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_entries"), r.getAs[Long]("n_exits"),
          r.getAs[Long]("n_bounces"), r.getAs[Long]("bounce_bp")))).toMap
    // view: enters 2 sessions (1 bounce), exits 1 (the bounce itself)
    assert(out("view") == ((2L, 1L, 1L, 5000L)))
    // click: enters 1 (its own bounce), exits 2
    assert(out("click") == ((1L, 2L, 1L, 10000L)))
  }

  test("orderReconciliation: exact/within/mismatch classes; headless orders apart; delta panel") {
    val s = spark
    import s.implicits._
    val orders = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0))
      .toDF("o_orderkey", "o_totalprice")
    val lineitem = Seq(
      (1L, 5.0, 0.0, 0.0), (1L, 5.0, 0.0, 0.0), // exact: 1000c
      (2L, 9.95, 0.0, 0.0),  // ⌊9.95·100⌋=994 (IEEE 9.949…): delta 6c ≤ 1% → within
      (3L, 5.0, 0.0, 0.0))                      // delta 500c → mismatch
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val r = graft.ops.Integrity
      .orderReconciliation(orders, lineitem, toleranceBp = 100L)
      .collect().head
    assert(r.getAs[Long]("n_orders") == 4L)
    assert(r.getAs[Long]("n_no_lines") == 1L)   // order 4
    assert(r.getAs[Long]("n_exact") == 1L)
    assert(r.getAs[Long]("n_within_tol") == 2L) // exact counts as within
    assert(r.getAs[Long]("within_tol_bp") == 6666L) // ⌊10000·2/3⌋
    // deltas {0, 6, 500}: ranks 2/3/3 of 3
    assert(r.getAs[Long]("p50_delta_cents") == 6L)
    assert(r.getAs[Long]("p90_delta_cents") == 500L)
    assert(r.getAs[Long]("p99_delta_cents") == 500L)
  }

  test("associationRules: lift beats popularity; support floor prunes 1-session pairs") {
    val s = spark
    import s.implicits._
    def bask(u: Long, items: Seq[Int]) = items.zipWithIndex.map { case (k, i) =>
      (u * 100 + i, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$i:00"),
        u, "click", 0.0, s"""{"k":$k}""")
    }
    // baskets: {1,2} {1,2} {1,3} {2} {3} — pair (1,2)×2, (1,3)×1
    val events = (bask(1, Seq(1, 2)) ++ bask(2, Seq(1, 2)) ++
      bask(3, Seq(1, 3)) ++ bask(4, Seq(2)) ++ bask(5, Seq(3)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Market.associationRules(events, k = 20, minPair = 2L)
      .collect()
    assert(out.length == 1) // (1,3) pruned by the support floor
    val r = out.head
    assert(r.getAs[Long]("item_a") == 1L && r.getAs[Long]("item_b") == 2L)
    assert(r.getAs[Long]("pair_sessions") == 2L)
    assert(r.getAs[Long]("sessions_a") == 3L && r.getAs[Long]("sessions_b") == 3L)
    assert(r.getAs[Long]("total_sessions") == 5L)
    // ⌊10000.0·2/3/3·5⌋ in left-to-right IEEE order
    assert(r.getAs[Long]("lift_bp") == 11111L)
  }

  test("keyChurn: identity churn distinguishes rotation from stability; NULLs excluded") {
    val s = spark
    import s.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val rows = Seq(
      (Some(1L), Some(t("2024-01-01"))),  // pre only → lost
      (Some(2L), Some(t("2024-01-01"))),  // both
      (Some(2L), Some(t("2024-01-20"))),
      (Some(3L), Some(t("2024-01-20"))),  // post only → new
      (Some(4L), Some(t("2024-01-20"))),  // post only → new
      (None, Some(t("2024-01-01"))),      // null key: excluded
      (Some(5L), None))                   // null ts: excluded
      .toDF("user_id", "ts")
    val r = graft.ops.Profile.keyChurn(rows, "user_id", "ts", "2024-01-10")
      .collect().head
    assert(r.getAs[Long]("n_pre_keys") == 2L)
    assert(r.getAs[Long]("n_post_keys") == 3L)
    assert(r.getAs[Long]("n_both") == 1L)
    assert(r.getAs[Long]("n_new") == 2L && r.getAs[Long]("n_lost") == 1L)
    assert(r.getAs[Long]("new_bp") == 6666L)  // ⌊10000·2/3⌋
    assert(r.getAs[Long]("lost_bp") == 5000L) // ⌊10000·1/2⌋
  }

  test("classifierCalibration: buckets cover all docs; agreement matches an independent recompute") {
    val docs = graft.tables.Tables(spark, sf, "documents")
    val out = graft.ops.TextAnalysis.classifierCalibration(docs).collect()
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0L && b <= 9L })
    val nDocs = docs.filter(col("text").isNotNull).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // independent recompute of total agreement via the two source ops
    val wantOk = graft.ops.TextAnalysis.textQuality(docs)
      .filter(col("quality_ok") === 1).count()
    assert(out.map(_.getAs[Long]("n_quality_ok")).sum == wantOk)
  }

  test("funnelByArm: arms partition the q116 funnel exactly") {
    val sessionized = graft.ops.Sessionize.assignSessions(
      graft.tables.Tables(spark, sf, "events"))
    val flow = Seq("signup", "view", "click", "purchase")
    val whole = graft.ops.PageFunnel.windowedFunnel(spark, sessionized,
      flow, 600L).collect()
      .map(r => r.getAs[Long]("step_idx") ->
        r.getAs[Long]("sessions_reached")).toMap
    val byArm = graft.ops.PageFunnel.windowedFunnelByArm(spark, sessionized,
      flow, 600L).collect()
    val armSums = byArm.groupBy(_.getAs[Long]("step_idx"))
      .map { case (i, rs) => i -> rs.map(_.getAs[Long]("sessions_reached")).sum }
    assert(armSums == whole)
    assert(byArm.map(_.getAs[String]("arm")).toSet == Set("A", "B"))
    // per-arm totals are arm-constant and sum to the session total
    val totals = byArm.groupBy(_.getAs[String]("arm"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("total_sessions")).toSet }
    assert(totals.forall(_.size == 1))
  }

  test("sequentialRules: order by first occurrence; repeats collapse; confidence vs antecedent") {
    val s = spark
    import s.implicits._
    def e(id: Long, u: Long, offS: Long, item: Int) =
      (id, new java.sql.Timestamp(1704067200000L + offS * 1000), u, "click",
        0.0, s"""{"k":$item}""")
    // user 1: 3@0, 1@10, 3@20 (repeat → first stays @0), 2@30 → seq [3,1,2]
    // user 2: 1@0, 3@10 → seq [1,3]
    val events = Seq(
      e(1, 1, 0, 3), e(2, 1, 10, 1), e(3, 1, 20, 3), e(4, 1, 30, 2),
      e(5, 2, 0, 1), e(6, 2, 10, 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Market.sequentialRules(events, k = 20)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 2L, 5000L),   // 1 then 2 (user 1)
      (1L, 3L, 1L, 2L, 5000L),   // 1 then 3 (user 2 — NOT user 1)
      (3L, 1L, 1L, 2L, 5000L),   // 3 then 1 (user 1)
      (3L, 2L, 1L, 2L, 5000L)))  // 3 then 2 (user 1)
  }

  test("returnedRevenue: only R-flag items in-window count; exact cents; top-k order") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val nation = Seq((1, "JAPAN")).toDF("n_nationkey", "n_name")
    val customer = Seq((100L, 1), (101L, 1)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (10L, 100L, ts("1996-05-01")),
      (11L, 101L, ts("1996-06-01")),
      (12L, 100L, ts("1994-01-01")))  // out of window
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (10L, "R", 10.0, 0.1),  // 900c → cust 100
      (10L, "N", 99.0, 0.0),  // not returned
      (11L, "R", 20.0, 0.0),  // 2000c → cust 101
      (12L, "R", 99.0, 0.0))  // out-of-window order
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val out = graft.ops.AreaTopProducts.returnedRevenue(
      lineitem, orders, customer, nation, "1996-01-01", "1997-01-01")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((101L, "JAPAN", 2000L, 1L), (100L, "JAPAN", 900L, 1L)))
  }

  test("partConcentration: single-source part scores 10000; even split 5000; volume floor binds") {
    val s = spark
    import s.implicits._
    val lineitem = (
      Seq.fill(10)((1L, 7L)) ++                      // part 1: one supplier
      (Seq.fill(5)((2L, 7L)) ++ Seq.fill(5)((2L, 8L))) ++ // part 2: 5/5 split
      Seq.fill(7)((3L, 7L)))                         // part 3: below minRows
      .toDF("l_partkey", "l_suppkey")
    val out = graft.ops.AreaTopProducts.partConcentration(lineitem,
      minRows = 8L, k = 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 10L, 10000L), (2L, 2L, 10L, 5000L)))
  }

  test("keySkew: hottest keys with shares and mean-multiples; null is a key") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(5)(Some(1L)) ++ Seq.fill(2)(Some(2L)) ++
      Seq.fill(3)(Option.empty[Long]))
      .toDF("user_id")
    val out = graft.ops.Profile.keySkew(df, "user_id", k = 10).collect()
      .map(r => Option(r.getAs[String]("key_value")) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("share_bp"),
          r.getAs[Long]("hot_x_mean_bp")))).toMap
    assert(out(Some("1")) == ((5L, 5000L, 15000L))) // 5 vs mean 10/3
    assert(out(Some("2")) == ((2L, 2000L, 6000L)))
    assert(out(None) == ((3L, 3000L, 9000L)))       // null key reported
  }

  test("propsSchema discovers keys dynamically; invalid JSON contributes nothing but still counts in the total") {
    val s = spark
    import s.implicits._
    val df = Seq(
      """{"a": 1, "b": "x"}""", """{"a": 2}""",
      null.asInstanceOf[String], "not json at all")
      .toDF("props")
    val out = graft.ops.Profile.propsSchema(df).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n_present"), r.getAs[Long]("n_values"),
          r.getAs[String]("min_value"), r.getAs[String]("max_value"),
          r.getAs[Long]("present_bp")))).toMap
    assert(out("a") == ((2L, 2L, "1", "2", 5000L)))
    assert(out("b") == ((1L, 1L, "x", "x", 2500L)))
    assert(out.size == 2)
  }

  test("quantileTable: each rank matches the single-rank operator; ranks are monotone") {
    val s = spark
    import s.implicits._
    val rows = (1 to 100).map(i => ("a", i.toDouble)) ++
      Seq.fill(10)(("b", 7.5))
    val df = rows.toDF("g", "v")
    val ranks = Seq(5000L, 9000L, 9900L)
    val table = graft.ops.Percentiles.quantileTable(df, "g", "v", ranks)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("rank_bp")) ->
        r.getAs[Long]("value_cents")).toMap
    ranks.foreach { p =>
      val single = graft.ops.Percentiles.quantileCents(df, "g", "v", p)
        .collect().map(r => r.getAs[String]("g") ->
          r.getAs[Long]("quantile_cents")).toMap
      assert(table(("a", p)) == single("a"), s"rank $p")
      assert(table(("b", p)) == single("b"), s"rank $p")
    }
    assert(table(("a", 5000L)) <= table(("a", 9000L)))
    assert(table(("a", 9000L)) <= table(("a", 9900L)))
    assert(table(("a", 5000L)) == 5000L && table(("a", 9900L)) == 9900L)
  }

  test("embeddingHealth flags null/empty/zero/non-finite vectors and ragged dims") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 2.0f), 1),
      (1L, null.asInstanceOf[Array[Float]], 1),
      (2L, Array.empty[Float], 1),
      (3L, Array(0.0f, 0.0f), 1),
      (4L, Array(Float.NaN, 1.0f), 1),
      (5L, Array(Float.PositiveInfinity, 1.0f, 2.0f), 1) // ragged: 3 dims
    ).toDF("vec_id", "embedding", "label")
    val r = graft.ops.Similarity.embeddingHealth(emb).head()
    assert(r.getAs[Long]("n_vecs") == 6L)
    assert(r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Long]("n_empty") == 1L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Long]("n_nonfinite") == 2L) // NaN + Infinity
    assert(r.getAs[Long]("dims_min") == 0L && r.getAs[Long]("dims_max") == 3L)
  }

  test("modalityCoverage counts matches and both orphan sides") {
    val s = spark
    import s.implicits._
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val emb = Seq(3L, 4L, 5L).toDF("vec_id")
    val r = graft.ops.Profile.modalityCoverage(docs, emb).head()
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_vecs"),
      r.getAs[Long]("n_matched"), r.getAs[Long]("docs_only"),
      r.getAs[Long]("vecs_only"), r.getAs[Long]("coverage_bp")) ==
      ((4L, 3L, 2L, 2L, 1L, 5000L)))
  }

  test("dailyActivityPivot: declared columns, residual fold, zero-fill, exact totals") {
    val s = spark
    import s.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 10:00:00")
    val evs = Seq(
      (0L, t("2024-01-01"), 1L, "view"), (1L, t("2024-01-01"), 1L, "view"),
      (2L, t("2024-01-01"), 2L, "click"),
      (3L, t("2024-01-01"), 2L, "mystery"), // undeclared → residual
      (4L, t("2024-01-02"), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.Retention
      .dailyActivityPivot(evs, Seq("view", "click", "purchase")).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("view"), r.getAs[Long]("click"),
          r.getAs[Long]("purchase"), r.getAs[Long]("other"),
          r.getAs[Long]("total")))).toMap
    assert(out("2024-01-01") == ((2L, 1L, 0L, 1L, 4L)))
    assert(out("2024-01-02") == ((0L, 0L, 1L, 0L, 1L))) // zero-filled
  }

  test("srmCheck: arms from the JVM-recomputed draw; event volume cannot bias the ratio") {
    val s = spark
    import s.implicits._
    // user 1 floods events; the DISTINCT-user ratio must ignore it
    val evs = (Seq.fill(50)(1L) ++ (2L to 9L)).zipWithIndex
      .map { case (u, i) => (i.toLong,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, "view") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.Experiment.srmCheck(evs).collect()
      .map(r => r.getAs[String]("arm") -> r.getAs[Long]("n_users")).toMap
    val want = (1L to 9L).groupBy(armOf).view.mapValues(_.size.toLong).toMap
    assert(out == want)
  }

  test("abLift: per-arm converters and pooled delta from hand journeys") {
    val s = spark
    import s.implicits._
    def row(id: Long, u: Long, typ: String) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, typ)
    val evs = (1L to 8L).flatMap { u =>
      Seq(row(u * 10, u, "view")) ++
        (if (u % 2 == 0) Seq(row(u * 10 + 1, u, "purchase")) else Nil)
    }.toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.ops.Experiment.abLift(evs).collect()
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val conv = rows.map(_.getAs[Long]("n_converted")).sum
    assert(total == 8L && conv == 4L)
    rows.foreach { r =>
      val (nu, nc) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_converted"))
      assert(r.getAs[Long]("conv_bp") ==
        math.floor(10000.0 * nc / nu).toLong)
      assert(r.getAs[Long]("pooled_bp") == 5000L)
      assert(r.getAs[Long]("delta_bp") ==
        r.getAs[Long]("conv_bp") - 5000L)
    }
  }

  test("cupedLift: θ and adjusted means match a straight-line recompute; constant pre-period → θ=0") {
    val s = spark
    import s.implicits._
    // whole-dollar values so floor(value*100) is IEEE-exact
    def row(id: Long, u: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"),
        u, "purchase", v)
    val xs = (1L to 8L).map(u => u -> 100L * u).toMap          // pre cents
    val ys = (1L to 8L).map(u => u -> 100L * (2 * u + u % 3)).toMap
    val evs = (1L to 8L).flatMap { u =>
      Seq(row(u * 10, u, 2, xs(u) / 100.0),
        row(u * 10 + 1, u, 20, ys(u) / 100.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.Experiment.cupedLift(evs, "2024-01-10").collect()
      .map(r => r.getAs[String]("arm") -> ((r.getAs[Long]("n_users"),
        r.getAs[Long]("raw_mean_cents"), r.getAs[Long]("adj_mean_cents"),
        r.getAs[Long]("theta_bp")))).toMap
    // straight-line recompute with the documented expression shape
    val n = 8.0
    val (sx, sy) = (xs.values.sum.toDouble, ys.values.sum.toDouble)
    val sxy = xs.keys.map(u => xs(u).toDouble * ys(u)).sum
    val sxx = xs.values.map(x => x.toDouble * x).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val xbar = sx / n
    val want = (1L to 8L).groupBy(armOf).map { case (arm, us) =>
      val (ax, ay) = (us.map(xs).sum.toDouble, us.map(ys).sum.toDouble)
      arm -> ((us.size.toLong,
        math.floor(ay / us.size).toLong,
        math.floor((ay - theta * (ax - us.size * xbar)) / us.size).toLong,
        math.floor(10000.0 * theta).toLong))
    }
    assert(out == want)
    assert(theta != 0.0) // the adjustment is actually exercised

    // constant pre-period: var(x)=0 → θ=0 → adjusted == raw
    val flat = (1L to 8L).flatMap { u =>
      Seq(row(u * 10, u, 2, 3.0), row(u * 10 + 1, u, 20, ys(u) / 100.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    graft.ops.Experiment.cupedLift(flat, "2024-01-10").collect().foreach { r =>
      assert(r.getAs[Long]("theta_bp") == 0L)
      assert(r.getAs[Long]("adj_mean_cents") == r.getAs[Long]("raw_mean_cents"))
    }
  }

  test("winsorizedLift: nearest-rank pooled cap; zero-metric users count; whale capped") {
    val s = spark
    import s.implicits._
    def row(id: Long, u: Long, typ: String, v: java.lang.Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, typ, v)
    // users 1..9 spend u dollars; user 10 never purchases (y=0)
    val evs = ((1L to 9L).map(u => row(u, u, "purchase", u.toDouble)) :+
      row(100L, 10L, "view", null)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.Experiment.winsorizedLift(evs, pBp = 5000L).collect()
      .map(r => r.getAs[String]("arm") -> ((r.getAs[Long]("n_users"),
        r.getAs[Long]("cap_cents"), r.getAs[Long]("raw_mean_cents"),
        r.getAs[Long]("wins_mean_cents")))).toMap
    // 10 users, rank ⌈10·0.5⌉=5 → 5th smallest of {0,100..900} = 400
    val ys = ((1L to 9L).map(u => u -> 100L * u) :+ (10L -> 0L)).toMap
    val want = (1L to 10L).groupBy(armOf).map { case (arm, us) =>
      arm -> ((us.size.toLong, 400L,
        math.floor(us.map(ys).sum.toDouble / us.size).toLong,
        math.floor(us.map(u => math.min(ys(u), 400L)).sum.toDouble /
          us.size).toLong))
    }
    assert(out == want)
    // the cap actually binds (a whale exists above it in some arm)
    assert(out.values.exists(v => v._4 < v._3))
  }

  test("refIntegrity: orphan keys/rows, NULL FKs counted apart, parent dupes collapsed") {
    val s = spark
    import s.implicits._
    // fk 1 and 2 exist; fk 9 is an orphan carried by TWO rows; one
    // NULL FK row must land in n_null_rows, not the orphan columns
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dupe + unused parent keys
    val out = graft.ops.Integrity.refIntegrity(Seq(
      graft.ops.Integrity.Edge("e1", child, "fk", parent, "pk"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("edge") == "e1")
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_keys") == 3L)        // 1, 2, 9
    assert(r.getAs[Long]("n_null_rows") == 1L)
    assert(r.getAs[Long]("n_orphan_keys") == 1L) // 9
    assert(r.getAs[Long]("n_orphan_rows") == 2L)
    assert(r.getAs[Long]("orphan_bp") == 3333L)  // ⌊10000·2/6⌋
  }

  test("profileDrift: null-rate and cardinality movement from hand snapshots; post-only column ratio 0") {
    val s = spark
    import s.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    // pre (day 1): a = [x, y, NULL, NULL], b all NULL
    // post (day 20): a = [x, x, x], b = [p, q]... b post on 2 of 3 rows
    val rows = Seq(
      (t("2024-01-01"), Some("x"), None: Option[String]),
      (t("2024-01-01"), Some("y"), None),
      (t("2024-01-01"), None, None),
      (t("2024-01-01"), None, None),
      (t("2024-01-20"), Some("x"), Some("p")),
      (t("2024-01-20"), Some("x"), Some("q")),
      (t("2024-01-20"), Some("x"), None))
      .toDF("ts", "a", "b")
    val out = graft.ops.Profile
      .profileDrift(rows, "ts", "2024-01-10", Seq("a", "b")).collect()
      .map(r => r.getAs[String]("column_name") -> ((
        r.getAs[Long]("n_pre"), r.getAs[Long]("n_post"),
        r.getAs[Long]("nn_pre"), r.getAs[Long]("nn_post"),
        r.getAs[Long]("nd_pre"), r.getAs[Long]("nd_post"),
        r.getAs[Long]("null_delta_bp"), r.getAs[Long]("nd_ratio_bp"))))
      .toMap
    // a: null rate 5000bp → 0 (delta −5000); distinct 2 → 1 (5000bp)
    assert(out("a") == ((4L, 3L, 2L, 3L, 2L, 1L, -5000L, 5000L)))
    // b: never seen pre → nd_ratio 0; nulls 10000bp → ⌊10000/3⌋=3333
    assert(out("b") == ((4L, 3L, 0L, 2L, 0L, 2L, 3333L - 10000L, 0L)))
  }

  test("joinFanout: exact Σ cl·cr forecast, NULL keys predict nothing, largest-key tie-break, empty match") {
    val s = spark
    import s.implicits._
    val left = Seq(Some(1L), Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("lk")
    val right = Seq(Some(1L), Some(2L), Some(2L), Some(2L), Some(3L),
      None, None).toDF("rk")
    val r = graft.ops.Integrity.joinFanout(left, "lk", right, "rk")
      .collect().head
    assert(r.getAs[Long]("n_left_rows") == 6L)
    assert(r.getAs[Long]("n_right_rows") == 7L)
    assert(r.getAs[Long]("n_left_keys") == 3L)   // 1, 2, 9
    assert(r.getAs[Long]("n_right_keys") == 3L)  // 1, 2, 3
    assert(r.getAs[Long]("n_matched_keys") == 2L)
    assert(r.getAs[String]("predicted_rows") == "6") // 3·1 + 1·3
    // fan ties at 3: key 2 beats key 1 (largest-key tie-break)
    assert(r.getAs[String]("hot_key") == "2")
    assert(r.getAs[String]("hot_fanout") == "3")

    // no matching key: report row survives with NULL hot columns
    val none = graft.ops.Integrity.joinFanout(
      Seq(1L).toDF("lk"), "lk", Seq(2L).toDF("rk"), "rk").collect().head
    assert(none.getAs[String]("predicted_rows") == "0")
    assert(none.getAs[String]("hot_key") == null)
  }

  test("timeToConvert: purchase BEFORE the first click is not a conversion and hides nothing") {
    val s = spark
    import s.implicits._
    val t0 = 1704067200000L // 2024-01-01 00:00:00 UTC
    def row(id: Long, u: Long, typ: String, offS: Long) =
      (id, new java.sql.Timestamp(t0 + offS * 1000L), u, typ)
    val evs = Seq(
      row(1, 1, "click", 0), row(2, 1, "purchase", 10),   // delay 10
      row(3, 2, "purchase", 0), row(4, 2, "click", 5),    // only a pre-click purchase → NOT converted
      row(5, 3, "purchase", 0), row(6, 3, "click", 5),    // early purchase ignored,
      row(7, 3, "purchase", 65),                          //   later one converts: delay 60
      row(8, 4, "click", 0),                              // never converts
      row(9, 5, "purchase", 0))                           // no click → not a funnel user
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.Integrity
      .timeToConvert(evs, ranksBp = Seq(5000L, 9900L)).collect()
      .map(r => r.getAs[Long]("rank_bp") -> ((r.getAs[Long]("delay_s"),
        r.getAs[Long]("n_from_users"), r.getAs[Long]("n_converted"))))
      .toMap
    // delays {10, 60}: rank ⌈2·0.5⌉=1 → 10; rank ⌈2·0.99⌉=2 → 60
    assert(out == Map(5000L -> ((10L, 4L, 2L)), 9900L -> ((60L, 4L, 2L))))
  }

  test("erasureAudit with an empty deny list touches nothing") {
    val s = spark
    import s.implicits._
    val empty = spark.emptyDataset[Long].toDF("user_id")
    val got = graft.ops.Erasure.erasureAudit(empty,
      Seq((1L, "a")).toDF("c_custkey", "c_name"),
      Seq((10L, 1L)).toDF("o_orderkey", "o_custkey"),
      Seq((10L, 1)).toDF("l_orderkey", "l_linenumber"),
      Seq((100L, 1L)).toDF("event_id", "user_id"))
      .collect()
    assert(got.forall(_.getAs[Long]("n_affected") == 0L))
    assert(got.map(_.getAs[Long]("n_rows")).sum == 4L)
  }

  test("keyBalance: skewed side scores below flat side; NULL keys excluded; exact Σc²") {
    val s = spark
    import s.implicits._
    val skewed = Seq(Some(1L), Some(1L), Some(1L), Some(1L), Some(2L),
      Some(2L), Some(3L), None).toDF("k")
    val flat = Seq(1L, 2L, 3L).toDF("k")
    val out = graft.ops.Integrity.keyBalance(Seq(
      ("skewed", skewed, "k"), ("flat", flat, "k")))
      .collect().map(r => r.getAs[String]("side") -> r).toMap
    val sk = out("skewed")
    assert(sk.getAs[Long]("n_rows") == 7L && sk.getAs[Long]("n_keys") == 3L)
    assert(sk.getAs[Long]("max_key_rows") == 4L)
    assert(sk.getAs[String]("sum_sq") == "21")      // 16+4+1
    assert(sk.getAs[Long]("eff_keys") == 2L)        // ⌊49/21⌋
    assert(sk.getAs[Long]("balance_bp") == 6666L)   // ⌊10000·2/3⌋
    val fl = out("flat")
    assert(fl.getAs[Long]("eff_keys") == 3L && fl.getAs[Long]("balance_bp") == 10000L)
  }

  test("decayedPopularity: exact dyadic half-life weights; future events excluded") {
    val s = spark
    import s.implicits._
    def ev(id: Long, day: String, item: String) =
      (id, java.sql.Timestamp.valueOf(s"$day 12:00:00"), 1L, "click", 0.0,
        s"""{"k":$item}""")
    val events = Seq(
      ev(1, "2024-01-10", "1"),  // age 0  → 1_000_000
      ev(2, "2024-01-09", "1"),  // age 1  → 1_000_000
      ev(3, "2024-01-03", "1"),  // age 7  → 500_000
      ev(4, "2023-11-01", "2"),  // age 70 → >>10 = 976
      ev(5, "2023-12-26", "2"),  // age 15 → >>2 = 250_000
      ev(6, "2024-01-11", "2"),  // FUTURE (age -1): excluded
      (7L, java.sql.Timestamp.valueOf("2024-01-10 12:00:00"), 1L, "click",
        0.0, """{"x":9}"""))     // no item key: excluded
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Market
      .decayedPopularity(events, "2024-01-10", halfLifeDays = 7, k = 20)
      .collect().map(r => (r.getAs[Long]("item"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("score_ppm"),
          r.getAs[Long]("last_age_days"))))
    assert(out.toSeq == Seq(
      1L -> ((3L, 2500000L, 0L)),
      2L -> ((2L, 250976L, 15L))))  // score order: item 1 first
  }

  test("seasonalDeviation: month indexed against its own cross-year mean") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "1-URGENT")
    val orders = Seq(
      o(1, "2023-01-05", 100.0), // Jan '23: 10000c of 40000c Jan total
      o(2, "2024-01-09", 300.0), // Jan '24: 30000c
      o(3, "2023-02-01", 200.0)) // Feb: single year → index 10000
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = graft.ops.Retention.seasonalDeviation(orders).collect()
      .map(r => ((r.getAs[Long]("year"), r.getAs[Long]("month")),
        (r.getAs[Long]("n_orders"), r.getAs[Long]("month_cents"),
          r.getAs[Long]("moy_index_bp"))))
    assert(got.toSeq == Seq(
      (2023L, 1L) -> ((1L, 10000L, 5000L)),   // ⌊10000·10000·2/40000⌋
      (2023L, 2L) -> ((1L, 20000L, 10000L)),
      (2024L, 1L) -> ((1L, 30000L, 15000L))))
  }

  test("sourceDatacard: null-safe tokens, dup/null rates, lang breadth") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "A", 5L),
      (2L, "a b c", "en", "A", 5L),               // exact dup
      (3L, null.asInstanceOf[String], "fr", "A", 0L), // null text: 0 tokens
      (4L, "x", "de", "B", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.Profile.sourceDatacard(docs).collect()
    assert(got.map(_.getAs[String]("source")).toSeq == Seq("A", "B"))
    val a = got(0)
    assert(a.getAs[Long]("n_docs") == 3L && a.getAs[Long]("n_text") == 2L)
    assert(a.getAs[Long]("null_bp") == 3333L)    // ⌊10000·1/3⌋
    assert(a.getAs[Long]("n_distinct_texts") == 1L)
    assert(a.getAs[Long]("dup_bp") == 5000L)     // ⌊10000·1/2⌋
    assert(a.getAs[Long]("tot_tokens") == 6L)    // NOT 5: null text adds 0, not -1
    assert(a.getAs[Long]("avg_tokens") == 3L)
    assert(a.getAs[Long]("tot_chars") == 10L && a.getAs[Long]("n_langs") == 2L)
    val b = got(1)
    assert(b.getAs[Long]("n_docs") == 1L && b.getAs[Long]("null_bp") == 0L &&
      b.getAs[Long]("dup_bp") == 0L && b.getAs[Long]("tot_tokens") == 1L &&
      b.getAs[Long]("n_langs") == 1L)
  }

  test("equiDepthBins: uniform values split evenly; heavy ties eat bins visibly") {
    val s = spark
    import s.implicits._
    // uniform: 1..10 into 5 bins of 2
    val uni = graft.ops.Percentiles.equiDepthBins(
      (1L to 10L).toDF("v"), "v", 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(uni == (1L to 5L).map(b => (b, 2L, 2 * b - 1L, 2 * b)))
    // ties: six 1s swallow bins 1-2 and land whole in bin 3
    // (value → bin of its LAST rank: bin = (cum−1)·nb div n + 1)
    val tied = graft.ops.Percentiles.equiDepthBins(
      (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("v"), "v", 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(tied == Seq((3L, 6L, 1L, 1L), (4L, 2L, 2L, 3L), (5L, 2L, 4L, 5L)))
    // nulls excluded like every quantile op
    val withNull = graft.ops.Percentiles.equiDepthBins(
      (Seq[Option[Long]](Some(1L), None, Some(2L)))
        .toDF("v"), "v", 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(withNull == Seq((1L, 1L, 1L, 1L), (2L, 1L, 2L, 2L)))
  }

  test("neymanAllocation: budget follows N·sigma exactly; degenerate and remainder paths") {
    val s = spark
    import s.implicits._
    def alloc(rows: Seq[(String, Long)], budget: Long) =
      graft.ops.StratifiedExtract.neymanAllocation(
        rows.toDF("stratum", "cents"), "stratum", "cents", budget)
        .collect().map(r => (r.getAs[String]("stratum"),
          r.getAs[Long]("ney_weight"), r.getAs[Long]("alloc"))).toSeq
    // A constant (sigma 0), B spread {0,200}: varnum_B = 2·40000−40000²/...
    // = 2·40000 − 200² = 40000 → weight 200; all 10 draws go to B
    val spread = alloc(Seq(("A", 100L), ("A", 100L), ("B", 0L), ("B", 200L)), 10L)
    assert(spread == Seq(("A", 0L, 0L), ("B", 200L, 10L)))
    // every stratum constant → uniform weights, remainder to A (asc)
    val flat = alloc(Seq(("A", 100L), ("A", 100L), ("B", 5L), ("B", 5L)), 5L)
    assert(flat.map(_._3) == Seq(3L, 2L))
    // equal weights 1 ({0,1} → varnum 1), budget 10 over 3 strata:
    // base 3 each, largest-remainder +1 to the first by name
    val rem = alloc(Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L),
      ("C", 0L), ("C", 1L)), 10L)
    assert(rem.map(_._2) == Seq(1L, 1L, 1L))
    assert(rem.map(_._3) == Seq(4L, 3L, 3L))
    assert(rem.map(_._3).sum == 10L)
  }

  test("gainsTable: DESC equal-depth tiers, conversion and cumulative gain") {
    val s = spark
    import s.implicits._
    val scored = Seq((4L, 1L), (3L, 1L), (2L, 0L), (1L, 0L))
      .toDF("score", "label")
    val got = graft.ops.Experiment.gainsTable(scored, "score", "label", 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 10000L, 10000L),
      (2L, 2L, 0L, 0L, 10000L)))
    // a fully tied score lands whole in ONE tier (the last-rank rule)
    val tied = graft.ops.Experiment.gainsTable(
      Seq((7L, 1L), (7L, 0L), (7L, 0L), (7L, 1L)).toDF("score", "label"),
      "score", "label", 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(tied == Seq((2L, 4L, 2L, 5000L, 10000L)))
  }

  test("theilSenTrend: median slope shrugs off the outlier day") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "x")
    // daily cents 10000, 20000, 30000, then an outlier 100000
    val orders = Seq(o(1, "2024-01-01", 100.0), o(2, "2024-01-02", 200.0),
      o(3, "2024-01-03", 300.0), o(4, "2024-01-04", 1000.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = graft.ops.Retention.theilSenTrend(orders).collect().head
    assert(r.getAs[Long]("n_days") == 4L && r.getAs[Long]("n_pairs") == 6L)
    // slopes (bp/day): 1e8 ×3, 3e8, 4e8, 7e8 → median (1e8+3e8)/2
    assert(r.getAs[Long]("slope_bp_per_day") == 200000000L)
  }

  test("robustVolumeAnomaly: a past spike can't mask detection; flags only the spike") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val events = ((1 to 5).map(d =>
      (d.toLong, t(f"2024-01-0$d%d 12:00:00"), 1L, "click")) ++
      (100 to 149).map(i => (i.toLong, t("2024-01-06 12:00:00"), 2L, "click")) :+
      (200L, t("2024-01-07 12:00:00"), 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Retention.robustVolumeAnomaly(events)
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("trail_n"),
          Option(r.get(r.fieldIndex("med"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("mad"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("is_anomaly")))).toMap
    assert(got("2024-01-06") == ((50L, 5L, Some(1L), Some(0L), 1L)))
    // the day AFTER the spike: MAD ignores the spike in its window —
    // med 1, mad 0, a normal count does NOT flag
    assert(got("2024-01-07") == ((1L, 6L, Some(1L), Some(0L), 0L)))
    // short-history days never flag (trail_n < minObs)
    assert(got("2024-01-02")._5 == 0L)
    assert(got.values.map(_._5).sum == 1L)
  }

  test("growthAccounting: new/returning attribution and cumulative base") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 11:00:00"), 1L, "view"), // same day dedups
      (3L, t("2024-01-02 10:00:00"), 1L, "view"), // returning
      (4L, t("2024-01-02 10:00:00"), 2L, "view")) // new on day 2
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Retention.growthAccounting(events)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 1L, 1L, 0L, 1L),
      ("2024-01-02", 2L, 1L, 1L, 2L)))
  }

  test("revenueAcf: alternating series — negative odd lags, positive even; constant series is null") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "x")
    val alt = Seq(o(1, "2024-01-01", 1.0), o(2, "2024-01-02", 3.0),
      o(3, "2024-01-03", 1.0), o(4, "2024-01-04", 3.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = graft.ops.Retention.revenueAcf(alt, maxLag = 5)
      .collect().map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("acf_bp"))).toSeq
    // c = {-400,400,-400,400}; varnum 640000; lags beyond the span
    // produce no pairs and no rows
    assert(got == Seq((1L, 3L, -7500L), (2L, 2L, 5000L), (3L, 1L, -2500L)))
    val const = Seq(o(1, "2024-01-01", 2.0), o(2, "2024-01-02", 2.0),
      o(3, "2024-01-03", 2.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val c = graft.ops.Retention.revenueAcf(const, maxLag = 2).collect()
    assert(c.forall(_.isNullAt(2))) // zero variance → undefined acf
  }

  test("fulfillmentLatency: exact nearest-rank picks per priority") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(s"$x 00:00:00")
    val orders = Seq((10L, "1-URGENT", t("2024-01-01")),
      (20L, "2-HIGH", t("2024-01-01")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    // URGENT latencies {1,2,3,4}; HIGH {10}
    val lines = Seq((10L, t("2024-01-02")), (10L, t("2024-01-03")),
      (10L, t("2024-01-04")), (10L, t("2024-01-05")), (20L, t("2024-01-11")))
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.ops.AreaTopProducts
      .fulfillmentLatency(lines, orders, Seq(5000L, 9900L))
      .collect().map(r => ((r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("rank_bp")),
        (r.getAs[Long]("value_cents"), r.getAs[Long]("n_rows")))).toMap
    assert(got(("1-URGENT", 5000L)) == ((200L, 4L))) // rank ceil(4·.5)=2 → 2 days
    assert(got(("1-URGENT", 9900L)) == ((400L, 4L)))
    assert(got(("2-HIGH", 5000L)) == ((1000L, 1L)))
  }

  test("cusumRevenue: step shift accumulates to an alarm; closed form matches hand recursion") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "x")
    // 4 days at 100c then 4 at 400c; slack 20%, alarm at 1 mean-day
    val orders = ((1 to 4).map(i => o(i, f"2024-01-0$i%d", 1.0)) ++
      (5 to 8).map(i => o(i, f"2024-01-0$i%d", 4.0)))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = graft.ops.Retention.cusumRevenue(orders, 2000L, 1L)
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("pos_bp"), r.getAs[Long]("neg_bp"),
          r.getAs[Long]("pos_alarm"), r.getAs[Long]("neg_alarm")))).toMap
    // hand recursion (µ=250c): + side grows 100c-days/day from day 5,
    // clears the 250c threshold on day 7; − side mirrors on days 3-4
    // and drains back to 0 once the shift lands
    assert(got("2024-01-08") == ((16000L, 0L, 1L, 0L)))
    assert(got("2024-01-07")._3 == 1L && got("2024-01-06")._3 == 0L)
    assert(got("2024-01-03")._4 == 1L && got("2024-01-04")._4 == 1L)
    assert(got("2024-01-05")._4 == 0L && got("2024-01-04")._2 == 16000L)
    assert(got("2024-01-07")._2 == 0L) // drained, not negative
  }

  test("benfordAudit: digit extraction, zero/negative exclusion, empty digits report 0") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 19L, 25L, 300L, 9L, 0L, -5L).toDF("cents")
    val got = graft.ops.Profile.benfordAudit(df, "cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (1L to 9L))
    val byD = got.map(r => r._1 -> r).toMap
    assert(byD(1L)._2 == 2L && byD(1L)._3 == 4000L)
    assert(byD(1L)._5 == 4000L - 3010L)
    assert(byD(2L)._2 == 1L && byD(3L)._2 == 1L && byD(9L)._2 == 1L)
    assert(byD(4L)._2 == 0L && byD(4L)._3 == 0L && byD(4L)._5 == -969L)
    assert(got.map(_._2).sum == 5L) // 0 and −5 excluded
  }

  test("kAnonymityProfile: size histogram of sub-k groups; safe groups absent") {
    val s = spark
    import s.implicits._
    val df = (Seq("x") ++ Seq.fill(2)("y") ++ Seq.fill(10)("z")).toDF("qi")
    val got = graft.ops.Profile.kAnonymityProfile(df, Seq("qi"), 5L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // total 13 rows; the 10-row group clears k and must not appear
    assert(got == Seq((1L, 1L, 1L, 769L), (2L, 1L, 2L, 1538L)))
  }

  test("lDiversityProfile: homogeneous groups flagged by distinct-sensitive count") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("A", "m"), ("A", "m"), ("A", "m"),        // diversity 1
      ("B", "m"), ("B", "n"),                    // diversity 2
      ("C", "m"), ("C", "n"), ("C", "o"))        // diversity 3: safe
      .toDF("qi", "sens")
    val got = graft.ops.Profile.lDiversityProfile(df, Seq("qi"), "sens", 3L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 3L, 3750L), (2L, 1L, 2L, 2500L)))
  }

  test("seasonalBacktest: strict year-1 pairing; exact MAE and weighted MAPE") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "x")
    val orders = Seq(
      o(1, "2023-01-15", 1.0),  // Jan'23 100c (train only)
      o(2, "2024-01-15", 1.5),  // Jan'24 150c: pred 100, |err| 50
      o(3, "2024-02-15", 2.0),  // Feb'24 200c (train only)
      o(4, "2025-02-15", 1.0),  // Feb'25 100c: pred 200, |err| 100
      o(5, "2027-01-15", 9.0))  // Jan'27: NO 2026 twin → excluded
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = graft.ops.Retention.seasonalBacktest(orders).collect().head
    assert(r.getAs[Long]("n_months") == 2L)
    assert(r.getAs[Long]("mae_cents") == 75L)
    assert(r.getAs[Long]("wmape_bp") == 6000L) // ⌊10000·150/250⌋
  }

  test("discountElasticity: closed-form OLS on a 2-point line; zero variance is null") {
    val s = spark
    import s.implicits._
    val li = Seq((0.00, 10.0), (0.10, 20.0)).toDF("l_discount", "l_quantity")
    val r = graft.ops.AreaTopProducts.discountElasticity(li).collect().head
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(r.getAs[Long]("slope_x100") == 100L)     // +1 unit / point
    assert(r.getAs[Long]("intercept_x100") == 1000L)
    val flat = Seq((0.05, 10.0), (0.05, 20.0)).toDF("l_discount", "l_quantity")
    val f = graft.ops.AreaTopProducts.discountElasticity(flat).collect().head
    assert(f.isNullAt(1) && f.isNullAt(2))
  }

  test("dowTypeLift: ISO dow; independence lift exact on a hand contingency table") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    // 2024-01-01 is a Monday (iso 1), 01-02 a Tuesday (iso 2)
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "A"),
      (2L, t("2024-01-01 11:00:00"), 1L, "A"),
      (3L, t("2024-01-01 12:00:00"), 1L, "A"),
      (4L, t("2024-01-02 10:00:00"), 1L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Retention.dowTypeLift(events)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 1L, 3L, 13333L),  // ⌊10000·3·4/(3·3)⌋
      ("B", 2L, 1L, 40000L))) // ⌊10000·1·4/(1·1)⌋
  }

  test("kendallDaily: concordant/discordant/tied pairs by hand") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "x")
    // day grain (n, cents): (1,100) (2,200) (3,150) (1,50)
    val orders = Seq(o(1, "2024-01-01", 1.0),
      o(2, "2024-01-02", 1.0), o(3, "2024-01-02", 1.0),
      o(4, "2024-01-03", 0.5), o(5, "2024-01-03", 0.5), o(6, "2024-01-03", 0.5),
      o(7, "2024-01-04", 0.5))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = graft.ops.Retention.kendallDaily(orders).collect().head
    assert(r.getAs[Long]("n_days") == 4L && r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("n_concordant") == 4L)
    assert(r.getAs[Long]("n_discordant") == 1L) // (d2,d3): n up, cents down
    assert(r.getAs[Long]("n_ties") == 1L)       // (d1,d4): equal n
    assert(r.getAs[Long]("tau_bp") == 5000L)    // ⌊10000·3/6⌋
  }

  test("lifecycleCensus: each stage assigned by tenure/recency precedence") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(s"$x 12:00:00")
    val events = Seq(
      (1L, t("2024-01-20"), 1L, "view"),  // tenure 5 → new
      (2L, t("2024-01-01"), 2L, "view"),  // recency 1 → active
      (3L, t("2024-01-24"), 2L, "view"),
      (4L, t("2024-01-01"), 3L, "view"),  // recency 10 → at_risk
      (5L, t("2024-01-15"), 3L, "view"),
      (6L, t("2024-01-01"), 4L, "view"),  // recency 20 → churned
      (7L, t("2024-01-05"), 4L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Retention
      .lifecycleCensus(events, "2024-01-25")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("active", 1L, 2500L), ("at_risk", 1L, 2500L),
      ("churned", 1L, 2500L), ("new", 1L, 2500L)))
  }

  test("skipGramPairs: +-window context, session isolation, repeats kept") {
    val s = spark
    import s.implicits._
    def ev(id: Long, user: Long, t: String, k: Long) =
      (id, java.sql.Timestamp.valueOf(t), user, "click", 1.0, s"""{"k":$k}""")
    val events = Seq(
      ev(0, 1, "2024-01-01 00:00:00", 1), ev(1, 1, "2024-01-01 00:01:00", 2),
      ev(2, 1, "2024-01-01 00:02:00", 3), ev(3, 1, "2024-01-01 00:03:00", 4),
      // user 2: two events >30 min apart — different sessions, no pair
      ev(4, 2, "2024-01-01 00:00:00", 7), ev(5, 2, "2024-01-01 05:00:00", 8),
      // user 3: the same item twice in one session — repeats pair
      ev(6, 3, "2024-01-01 00:00:00", 5), ev(7, 3, "2024-01-01 00:01:00", 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.Market
      .skipGramPairs(events, window = 2, k = 100, minCount = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    val m = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((5L, 5L)) == 2L) // both directions of the repeat
    assert(m((1L, 2L)) == 1L && m((1L, 3L)) == 1L && !m.contains((1L, 4L)))
    assert(m((2L, 4L)) == 1L && m((3L, 1L)) == 1L)
    assert(!m.contains((7L, 8L)) && !m.contains((8L, 7L)))
    assert(got.map(_._3).sum == 12L) // 10 from [1,2,3,4] + 2 repeats
  }

  test("growthDecomposition: multiplicative identity by hand; gap years report null") {
    val s = spark
    import s.implicits._
    def o(k: Long, d: String, p: Double) =
      (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "x")
    val orders = Seq(
      o(1, "2023-03-01", 1.0), o(2, "2023-07-01", 1.0),      // 2 × 100c
      o(3, "2024-01-01", 1.5), o(4, "2024-02-01", 1.5),      // 4 orders,
      o(5, "2024-03-01", 1.5), o(6, "2024-04-01", 1.5),      // 600c
      o(7, "2027-01-01", 9.0))                               // gap year
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = graft.ops.Retention.growthDecomposition(orders).collect()
      .map(r => r.getAs[Long]("year") -> r).toMap
    val y24 = got(2024L)
    assert(y24.getAs[Long]("aov_cents") == 150L)
    assert(y24.getAs[Long]("rev_growth_bp") == 20000L) // 200c → 600c
    assert(y24.getAs[Long]("vol_growth_bp") == 10000L) // 2 → 4 orders
    assert(y24.getAs[Long]("aov_growth_bp") == 5000L)  // 100c → 150c
    // (1+2.0) == (1+1.0)·(1+0.5): the identity the decomposition states
    assert(got(2023L).isNullAt(4) && got(2027L).isNullAt(4)) // no y-1 twin
  }

  test("orderComposition: per-bucket order and revenue shares") {
    val s = spark
    import s.implicits._
    val li = Seq((10L, 1.0, 0.0), (20L, 1.0, 0.0), (20L, 1.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val got = graft.ops.Retention.orderComposition(li)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 5000L, 100L, 3333L),
      (2L, 1L, 5000L, 200L, 6666L)))
  }

  test("conversionHazard: censoring, same-day conversion, pre-signup purchases ignored") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(s"$x 12:00:00")
    val events = Seq(
      (1L, t("2024-01-01"), 1L, "signup"),
      (2L, t("2024-01-03"), 1L, "purchase"),  // u1: converts at t=2
      (3L, t("2024-01-01"), 2L, "signup"),    // u2: censored, never converts
      (4L, t("2024-01-05"), 2L, "view"),      // also sets censor day Jan 5
      (5L, t("2024-01-04"), 3L, "signup"),
      (6L, t("2024-01-04"), 3L, "purchase"),  // u3: same-day, t=0
      (7L, t("2024-01-02"), 4L, "view"),      // u4: no signup → excluded
      (8L, t("2024-01-01"), 5L, "purchase"),  // PRE-signup purchase: ignored
      (9L, t("2024-01-03"), 5L, "signup"),
      (10L, t("2024-01-04"), 5L, "purchase")) // u5: converts at t=1
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Retention.conversionHazard(events)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 4L, 1L, 2500L),  // u1,u2,u3,u5 at risk; u3 converts
      (1L, 3L, 1L, 3333L),  // u5 converts at 1
      (2L, 2L, 1L, 5000L),  // u1 converts at 2
      (3L, 1L, 0L, 0L),     // only censored u2 remains
      (4L, 1L, 0L, 0L)))
  }

  test("zorderCells: 1-bit grid = quadrants; spans measured on raw values") {
    val s = spark
    import s.implicits._
    // corners of a [0,10]² box + one interior point that lands in
    // quadrant 0 and stretches its span to half the range
    val df = Seq((0L, 0L), (10L, 0L), (0L, 10L), (10L, 10L), (5L, 5L))
      .toDF("x", "y")
    val got = graft.ops.Layout.zorderCells(df, "x", "y",
      gridBits = 1, cellBits = 2).collect()
    assert(got.map(_.getAs[Long]("cell")).toSeq == Seq(0L, 1L, 2L, 3L))
    val q0 = got(0) // (0,0) and (5,5): pos 5*1//10 = 0
    assert(q0.getAs[Long]("n_rows") == 2L)
    assert(q0.getAs[Long]("max_a") == 5L && q0.getAs[Long]("max_b") == 5L)
    assert(q0.getAs[Long]("span_a_bp") == 5000L &&
      q0.getAs[Long]("span_b_bp") == 5000L)
    // cell 1 = a high, b low (a on even bits); pure corners span 0
    val q1 = got(1)
    assert(q1.getAs[Long]("min_a") == 10L && q1.getAs[Long]("min_b") == 0L)
    assert(q1.getAs[Long]("span_a_bp") == 0L)
  }

  test("anomalySessionOverlap: midnight straddler counted with exact overlap seconds") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val baseline = (1 to 5).map(d =>
      (d.toLong, t(f"2024-01-0$d%d 12:00:00"), 1L, "click"))
    // 50-event spike on Jan 6 (user 2, one instant → one 0-length session)
    val spike = (100 to 149).map(i =>
      (i.toLong, t("2024-01-06 12:00:00"), 2L, "click"))
    // user 99 straddles midnight into the flagged day: 23:45 → 00:15
    // (gap 1800 s = NOT a session break; overlap with Jan 6 = 900 s)
    val straddle = Seq(
      (200L, t("2024-01-05 23:45:00"), 99L, "click"),
      (201L, t("2024-01-06 00:15:00"), 99L, "click"))
    val events = (baseline ++ spike ++ straddle)
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Retention.anomalySessionOverlap(events).collect()
    // the straddler's 23:45 event ALSO lifts Jan 5 off the
    // zero-variance baseline, so both days flag — and the straddling
    // session is correctly counted on each side of midnight
    assert(got.map(_.getAs[String]("day")).toSeq ==
      Seq("2024-01-05", "2024-01-06"))
    val d5 = got(0) // user 1's point session + the straddler
    assert(d5.getAs[Long]("n_sessions") == 2L &&
      d5.getAs[Long]("n_users") == 2L &&
      d5.getAs[Long]("overlap_seconds") == 900L) // 23:45 → midnight
    val d6 = got(1) // the spike's point session + the straddler
    assert(d6.getAs[Long]("n_sessions") == 2L &&
      d6.getAs[Long]("n_users") == 2L &&
      d6.getAs[Long]("overlap_seconds") == 900L) // midnight → 00:15
  }

  test("minCostSupplier: per-part window min; ties all kept; region/size/type gates bind") {
    val region = Seq((1, "ASIA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "JAPAN", 1), (20, "FRANCE", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((7L, "S7", 10, 100.50), (8L, "S8", 10, 50.0),
      (9L, "S9", 20, 999.0)) // S9: out of region
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq((1L, "STANDARD", 5), (2L, "STANDARD", 9), // 2: size gate
      (3L, "PROMO", 5), (4L, "STANDARD", 5))                 // 3: type gate
      .toDF("p_partkey", "p_type", "p_size")
    val li = Seq(
      (1L, 7L, 100.0, 10.0), // S7@p1 1000c
      (1L, 7L, 50.0, 10.0),  // S7@p1 500c → S7 offer = 500 (min of its rows)
      (1L, 8L, 60.0, 10.0),  // S8@p1 600c: loses
      (1L, 9L, 1.0, 1.0),    // cheapest but out-of-region
      (2L, 7L, 1.0, 1.0), (3L, 7L, 1.0, 1.0), // gated parts
      (4L, 7L, 50.0, 10.0),  // S7@p4 500c — tie
      (4L, 8L, 50.0, 10.0))  // S8@p4 500c — tie: both kept
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val out = AreaTopProducts.minCostSupplier(li, part, supplier, nation,
      region, "ASIA", Seq(5), "STANDARD")
      .as[(Long, String, String, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (10050L, "S7", "JAPAN", 1L, "STANDARD", 500L),
      (10050L, "S7", "JAPAN", 4L, "STANDARD", 500L),
      (5000L, "S8", "JAPAN", 4L, "STANDARD", 500L)))
  }

  test("productProfit: name token gates parts; profit = rev cents − dyadic cost proxy") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val part = Seq((1L, "red widget", 10.0), (2L, "blue bolt", 10.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val supplier = Seq((7L, 10)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((10, "JAPAN")).toDF("n_nationkey", "n_name")
    val orders = Seq((100L, ts("1996-05-01")), (101L, ts("1997-02-01")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      // floor(100·0.9·100)=9000c rev − floor(10·2·50)=1000c cost → 8000
      (100L, 1L, 7L, 2.0, 100.0, 0.1),
      // 5000 − 500 → 4500 in 1997
      (101L, 1L, 7L, 1.0, 50.0, 0.0),
      (100L, 2L, 7L, 1.0, 999.0, 0.0)) // name-gated out
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val out = AreaTopProducts.productProfit(li, orders, part, supplier,
      nation, "red").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("JAPAN", 1997L, 4500L, 1L),
      ("JAPAN", 1996L, 8000L, 1L)))
  }

  test("importantParts: dyadic 1/1024 share threshold on pure BIGINT cents") {
    val nation = Seq((3, "NATION_3"), (4, "NATION_4"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((7L, 3), (8L, 4)).toDF("s_suppkey", "s_nationkey")
    val li = Seq(
      (1L, 7L, 100.0),  // p1: 10000c — 10000·1024 > 10005 ✓
      (2L, 7L, 0.05),   // p2: 5c — 5120 < 10005 ✗
      (3L, 8L, 999.0))  // other nation: not in the pool at all
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val out = AreaTopProducts.importantParts(li, supplier, nation,
      "NATION_3").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10000L)))
  }

  test("partSupplierCounts: brand/type/size and flagged-supplier exclusions; distinct count") {
    val part = Seq(
      (1L, "Brand#1", "SMALL", 2), (2L, "Brand#13", "SMALL", 2), // brand gate
      (3L, "Brand#1", "PROMO", 2), (4L, "Brand#1", "SMALL", 3))  // type/size
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supplier = Seq((7L, 10.0), (8L, -1.0)) // 8: flagged
      .toDF("s_suppkey", "s_acctbal")
    val li = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (3L, 7L), (4L, 7L))
      .toDF("l_partkey", "l_suppkey")
    val out = AreaTopProducts.partSupplierCounts(li, part, supplier,
      "Brand#13", "PROMO", Seq(2))
      .as[(String, String, Int, Long)].collect().toSeq
    assert(out == Seq(("Brand#1", "SMALL", 2, 1L)))
  }

  test("excessSuppliers: 2·q > total per part-year; domination measured before the nation gate") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val nation = Seq((5, "NATION_5"), (6, "NATION_6"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((7L, "S7", 5), (8L, "S8", 6))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val li = Seq(
      (1L, 7L, ts("1996-03-01"), 6.0), // p1/1996: S7=6 of 10 → dominates
      (1L, 8L, ts("1996-04-01"), 4.0),
      (1L, 7L, ts("1997-03-01"), 5.0), // p1/1997: 5 of 10 → exactly half: no
      (1L, 8L, ts("1997-04-01"), 5.0),
      (2L, 8L, ts("1996-03-01"), 10.0)) // S8 dominates p2 but wrong nation
      .toDF("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
    val out = AreaTopProducts.excessSuppliers(li, supplier, nation,
      "NATION_5").as[(String, Long)].collect().toSeq
    assert(out == Seq(("S7", 1L)))
  }

  test("trailingRevenue: RANGE frame — a calendar gap excludes stale days (ROWS would not)") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val orders = Seq(
      (1L, ts("2024-01-01"), 1.0), (2L, ts("2024-01-02"), 2.0),
      (3L, ts("2024-01-09"), 4.0)) // 7+ days after day 2
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Retention.trailingRevenue(orders, windowDays = 7)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 100L, 1L, 100L, 1L),
      ("2024-01-02", 200L, 1L, 300L, 2L),
      // day 9's trailing window is [Jan 3, Jan 9] — days 1-2 are OUT;
      // a 6-PRECEDING ROWS frame would wrongly report 700
      ("2024-01-09", 400L, 1L, 400L, 1L)))
  }

  test("zeroSalesDays: span vs distinct sale days; min-span gate") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val li = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-31")), // span 31, 2 days
      (2L, ts("2024-01-01")), (2L, ts("2024-01-05"))) // span 5: gated
      .toDF("l_partkey", "l_shipdate")
    val out = Integrity.zeroSalesDays(li, minSpanDays = 30L, k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 31L, 2L, 29L, 9354L)))
  }

  test("crossSourceDups: diagonal always present (0 = clean); shared texts credit the pair") {
    val docs = Seq(
      (1L, "dup text", "s1"), (2L, "dup text", "s1"), // within-s1 dup
      (3L, "shared", "s1"), (4L, "shared", "s2"),     // cross pair
      (5L, "only c", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Integrity.crossSourceDups(docs)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("s1", "s1", 1L), ("s1", "s2", 1L), ("s2", "s2", 0L)))
  }

  test("weightedQuantileTable: rank positions in weight mass, not rows") {
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 9.0))
      .toDF("grp", "price", "qty")
    val out = Percentiles.weightedQuantileTable(df, "grp", "price", "qty",
      Seq(5000L, 9900L))
      .as[(String, Long, Long, Long)].collect().toSeq
    // total weight 10; the 50% crossing needs cum >= 5 → 2.0 (a
    // row-ranked median would say 1.0/2.0 split) — 200 cents
    assert(out == Seq(("g", 5000L, 200L, 10L), ("g", 9900L, 200L, 10L)))
  }

  test("revenueBridge: conditional sums pair strict years; empty base year → null growth") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val orders = Seq(
      (10L, 1L, ts("1997-03-01"), 2.0), (11L, 1L, ts("1996-03-01"), 1.0),
      (12L, 2L, ts("1997-05-01"), 3.0), // no 1996 base
      (13L, 1L, ts("1995-01-01"), 9.0)) // out of window
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, 1), (2L, 2)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((1, "N1"), (2, "N2")).toDF("n_nationkey", "n_name")
    val out = Retention.revenueBridge(orders, cust, nat, 1997)
      .collect().map(r => (r.getAs[String]("nation"),
        r.getAs[Long]("rev_cents"), r.getAs[Long]("prev_cents"),
        r.getAs[Long]("delta_cents"), r.getAs[java.lang.Long]("growth_bp")))
      .toSeq
    assert(out == Seq(
      ("N2", 300L, 0L, 300L, null.asInstanceOf[java.lang.Long]),
      ("N1", 200L, 100L, 100L, java.lang.Long.valueOf(10000L))))
  }

  test("duplicateOrders: candidate grain (cust, day); exact dupes flagged, exposed summed") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val orders = Seq(
      // cust 1, one day, 5 orders: 3× 100c + 2 distinct → exact group,
      // exposed = 2·100c beyond the first copy
      (1L, 1L, ts("2024-01-01"), 1.0), (2L, 1L, ts("2024-01-01"), 1.0),
      (3L, 1L, ts("2024-01-01"), 1.0),
      (4L, 1L, ts("2024-01-01"), 2.0), (5L, 1L, ts("2024-01-01"), 3.0),
      // cust 2: a same-day pair with DIFFERENT amounts — candidate,
      // not exact, zero exposed
      (6L, 2L, ts("2024-01-01"), 1.0), (7L, 2L, ts("2024-01-01"), 4.0),
      (8L, 3L, ts("2024-01-01"), 1.0)) // singleton: not reported
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Integrity.duplicateOrders(orders)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (2L, 1L, 2L, 0L, 0L),
      (5L, 1L, 5L, 1L, 200L)))
  }

  test("priceDispersion: min-lines gate; spread ranked desc with partkey tie-break") {
    val li = Seq(
      (1L, 100.0, 1.0), (1L, 50.0, 1.0), (1L, 100.0, 1.0), // spread 5000
      (2L, 1.0, 1.0), (2L, 99.0, 1.0),                     // only 2 lines
      (3L, 10.0, 1.0), (3L, 10.0, 1.0), (3L, 10.0, 1.0))   // spread 0
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
    val out = Integrity.priceDispersion(li, minLines = 3L, k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 5000L, 10000L, 5000L),
      (3L, 3L, 1000L, 1000L, 0L)))
  }

  test("linenumberAudit: dup beats gap; offset starts count as gaps") {
    val li = Seq(
      (1L, 1), (1L, 2), (1L, 3), // ok
      (2L, 1), (2L, 1),          // dup
      (3L, 1), (3L, 3),          // gap (hole)
      (4L, 2))                   // gap (offset start)
      .toDF("l_orderkey", "l_linenumber")
    val out = Integrity.linenumberAudit(li)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out == ((4L, 1L, 2L, 1L)))
  }

  test("groupingSetsTotals: both margins + grand total, no cross product; flags disambiguate") {
    val orders = Seq(("A", "O", 1.0), ("A", "F", 2.0), ("B", "O", 3.0))
      .toDF("o_orderpriority", "o_orderstatus", "o_totalprice")
    val out = Percentiles.groupingSetsTotals(orders,
      "o_orderpriority", "o_orderstatus", "o_totalprice")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", "ALL", 0L, 1L, 2L, 300L),
      ("B", "ALL", 0L, 1L, 1L, 300L),
      ("ALL", "F", 1L, 0L, 1L, 200L),
      ("ALL", "O", 1L, 0L, 2L, 400L),
      ("ALL", "ALL", 1L, 1L, 3L, 600L)))
  }

  test("vocabGrowth: cumulative distinct via first occurrence; TTR falls as the corpus grows") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a"), (4L, "d"))
      .toDF("doc_id", "text")
    val out = Retrieval.vocabGrowth(docs, checkpoints = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 2L, 2L, 10000L),
      (2L, 2L, 2L, 4L, 3L, 7500L),
      (3L, 3L, 3L, 5L, 3L, 6000L),
      (4L, 4L, 4L, 6L, 4L, 6666L)))
  }

  test("docKeywords: bitlen idf sinks corpus-wide tokens; token-asc tie-break") {
    val docs = Seq(
      (1L, "apple apple banana"), (2L, "apple cherry"),
      (3L, "apple dog"), (4L, "apple elk"))
      .toDF("doc_id", "text")
    val out = Retrieval.docKeywords(docs, k = 3)
      .filter(col("doc_id") === 1L)
      .as[(Long, Int, String, Long, Long, Int, Long)].collect().toSeq
    // N=4: apple df=4 → 0 bits (score 0 despite tf 2); banana df=1 →
    // ⌊log₂4⌋=2 bits, score 2 → rank 1
    assert(out == Seq(
      (1L, 1, "banana", 1L, 1L, 2, 2L),
      (1L, 2, "apple", 2L, 4L, 0, 0L)))
  }

  test("clusteringCoefficient: triangle + pendant — clique members at 10000, hub diluted") {
    val pairs = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L), (1L, 4L, 5L))
      .toDF("item_a", "item_b", "pair_sessions")
    val out = Graph.clusteringCoefficient(pairs, minWeight = 1L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // node 1: deg 3, 1 triangle → 2/(3·2) = 3333 bp; nodes 2,3: deg 2
    // → 10000; node 4: deg 1 excluded. All land in bitlen band 1;
    // mean = ⌊23333/3⌋ = 7777.
    assert(out == Seq((1L, 3L, 7777L, 3333L, 10000L)))
  }

  test("tClosenessProfile: one-sided TV identity matches the hand distribution math") {
    val rows = Seq.fill(4)(("A", "X")) ++
      (Seq.fill(3)(("B", "X")) :+ (("B", "Y"))) ++
      Seq(("C", "X"), ("C", "Y"))
    val df = rows.toDF("grp", "s")
    val out = Profile.tClosenessProfile(df, Seq("grp"), "s", bandBp = 1000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // global: X 8/10, Y 2/10. TV: A (all X) = 0.2 → 2000; B (3X,1Y)
    // = 0.05 → 500; C (1X,1Y) = 0.3 → 3000.
    assert(out == Seq(
      (0L, 1L, 4L, 500L),
      (2L, 1L, 4L, 2000L),
      (3L, 1L, 2L, 3000L)))
  }

  test("orderBacklog: same-day close nets to zero at EOD; lineless orders never close") {
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val orders = Seq(
      (1L, ts("2024-01-01"), 10.0), // closes on d3 (last line)
      (2L, ts("2024-01-01"), 5.0),  // ships same day: 0 net at EOD
      (3L, ts("2024-01-02"), 2.0))  // no lines: stays open forever
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val li = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-03")),
      (2L, ts("2024-01-01")))
      .toDF("l_orderkey", "l_shipdate")
    val out = Retention.orderBacklog(li, orders)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 1L, 1L, 1000L),
      ("2024-01-02", 1L, 0L, 2L, 1200L),
      ("2024-01-03", 0L, 1L, 1L, 200L)))
  }

  test("pruningAudit: diagonal layout — every probe touches exactly one cell, both dims") {
    // a = b = 0..15, gridBits=4 → pos == value; cell = top bit of
    // each dim interleaved → rows 0-7 in cell 0, rows 8-15 in cell 3.
    // 4 probes of width 4; each probe's rows live in one cell.
    val df = (0L to 15L).map(i => (i, i)).toDF("x", "y")
    val out = Layout.pruningAudit(df, "x", "y",
      gridBits = 4, cellBits = 2, probes = 4)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val expect = for (d <- Seq("a", "b"); i <- 0L to 3L) yield
      (d, i, 4 * i, 4 * i + 3, 1L, 8L, 4L, 5000L, 2500L)
    assert(out == expect)
  }

  test("pruningAudit: a gap probe selects nothing but still scans the spanning cell") {
    // one wide cell spanning [0, 15] with rows only at the edges: the
    // middle probes match zero rows yet the zone map can't skip them.
    val df = Seq((0L, 0L), (15L, 0L)).toDF("x", "y")
    val out = Layout.pruningAudit(df, "x", "y",
      gridBits = 4, cellBits = 2, probes = 4)
      .filter(col("dim") === "a")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // cells: (0,0) → cell 0; (15,0) → pos a=15 b=0 → cell 1 (a-top
    // bit set, b-top clear). Probe 0 [0,3]: scans cell0 only (cell1's
    // min_a=15 > 3). Probes 1-2: scan nothing, select nothing. Probe
    // 3 [12,15]: scans cell1.
    assert(out == Seq(
      ("a", 0L, 0L, 3L, 1L, 1L, 1L, 5000L, 5000L),
      ("a", 1L, 4L, 7L, 0L, 0L, 0L, 0L, 0L),
      ("a", 2L, 8L, 11L, 0L, 0L, 0L, 0L, 0L),
      ("a", 3L, 12L, 15L, 1L, 1L, 1L, 5000L, 5000L)))
  }

  test("mannWhitney: doubled midranks, U identities, and CLES match a JVM recompute") {
    val s2 = spark
    import s2.implicits._
    // per-user metric = event count: craft counts 1,2,2,3,1,5 over six
    // users; arms come from the md5 draw, so recompute them the same way
    val counts = Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3, 5L -> 1, 6L -> 5)
    val events = counts.toSeq.flatMap { case (u, n) =>
      (1 to n).map(_ => u)
    }.toDF("user_id")
    val got = Experiment.mannWhitney(events).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("rank_sum_x2"),
          r.getAs[Long]("u_x2"), r.getAs[Long]("cles_bp")))).toMap
    // JVM recompute with exact midranks (doubled units)
    val arms = counts.keys.toSeq.toDF("user_id")
      .select(col("user_id"),
        graft.ops.Experiment.armCol("user_id", 50).as("arm"))
      .as[(Long, String)].collect().toMap
    val ms = counts.toSeq.map { case (u, m) => (m.toLong, arms(u)) }
    val byV = ms.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L; var rA2 = 0L
    byV.foreach { case (_, g) =>
      val rank2 = 2 * cum + g.size + 1
      rA2 += rank2 * g.count(_._2 == "A"); cum += g.size
    }
    val n = ms.size.toLong; val nA = ms.count(_._2 == "A").toLong
    val uA2 = rA2 - nA * (nA + 1)
    assert(got("A") == ((nA, rA2, uA2,
      math.floor(10000.0 * uA2 / (2.0 * nA * (n - nA))).toLong)))
    val uB2 = 2 * nA * (n - nA) - uA2
    assert(got("B") == ((n - nA, n * (n + 1) - rA2, uB2,
      math.floor(10000.0 * uB2 / (2.0 * nA * (n - nA))).toLong)))
    // identities: rank mass conserves; U_A + U_B = n_a * n_b
    assert(got("A")._2 + got("B")._2 == n * (n + 1))
    assert(got("A")._3 + got("B")._3 == 2 * nA * (n - nA))
  }

  test("trailingMedianRevenue: rank-midpoint medians; calendar gap shrinks the window") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      ("2024-01-01", 1.0), ("2024-01-01", 0.5), // day total 150
      ("2024-01-02", 3.0),                      // 300
      ("2024-01-03", 2.0),                      // 200
      ("2024-01-15", 5.0)                       // 500, past the gap
    ).toDF("o_orderdate", "o_totalprice")
    val got = Retention.trailingMedianRevenue(orders, 7).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("cents"), r.getAs[Long]("trail_median_cents"),
          r.getAs[Long]("n_window_days")))).toMap
    assert(got("2024-01-01") == ((150L, 150L, 1L)))
    assert(got("2024-01-02") == ((300L, 225L, 2L))) // (150+300) div 2
    assert(got("2024-01-03") == ((200L, 200L, 3L)))
    assert(got("2024-01-15") == ((500L, 500L, 1L)), "gap leaked old days")
  }

  test("zipfDecay: per-octave ratios from engineered frequencies; missing 2r rank drops") {
    val s2 = spark
    import s2.implicits._
    val text = (Seq.fill(8)("t1") ++ Seq.fill(4)("t2") ++
      Seq.fill(2)("t3") ++ Seq("t4")).mkString(" ")
    val docs = Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.zipfDecay(docs, 64)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // rank1 f=8 vs rank2 f=4 -> 5000; rank2 f=4 vs rank4 f=1 -> 2500;
    // rank4 has no rank8 partner -> dropped
    assert(got == Seq((1L, 8L, 4L, 5000L), (2L, 4L, 1L, 2500L)))
  }

  test("linkPrediction: 2-hop non-edges scored; existing edges excluded") {
    val s2 = spark
    import s2.implicits._
    // path 1-2-3-4 plus the direct edge (1,3): wedge (1,3) at center 2
    // is a REAL edge and must not be predicted
    val pairs = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 3L, 1L))
      .toDF("item_a", "item_b", "pair_sessions")
    val got = Graph.linkPrediction(pairs, 1L, 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // deg: 1->2, 2->2, 3->3, 4->1. candidates: (1,4) via 3, (2,4) via 3
    assert(got == Seq(
      (1L, 4L, 1L, 2L, 1L, 5000L),
      (2L, 4L, 1L, 2L, 1L, 5000L)))
  }

  test("eventBurstDedup: chained bursts collapse to the first; per-type rollup") {
    val s2 = spark
    import s2.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, sec))
    val events = Seq(
      (1L, "click", 1L, ts(0)), (1L, "click", 2L, ts(5)),
      (1L, "click", 3L, ts(9)), (1L, "click", 4L, ts(30)),
      (2L, "click", 5L, ts(0)),
      (1L, "view", 6L, ts(0)), (1L, "view", 7L, ts(20))
    ).toDF("user_id", "event_type", "event_id", "ts")
    val got = Dedup.eventBurstDedup(events, 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // click: 5 events, the 5s and 9s rows chain off the first (gap to
    // PREVIOUS <= 10s each) -> 2 dups; the 30s row restarts
    assert(got == Seq(
      ("click", 5L, 2L, 4000L, 3L),
      ("view", 2L, 0L, 0L, 2L)))
  }

  test("layoutCompare: single-column sort prunes its own dim and nothing else; Z bounded on both") {
    val s2 = spark
    import s2.implicits._
    // 4x4 value grid scaled to [0,15]: under ORDER BY a, every cell
    // spans ALL of b (b probes scan 100%); Z quadrants bound both dims
    val df = (for (x <- 0 to 3; y <- 0 to 3) yield (x * 5L, y * 5L))
      .toDF("x", "y")
    val got = Layout.layoutCompare(df, "x", "y",
      gridBits = 4, cellBits = 2, probes = 4)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val expect = for (d <- Seq("a", "b"); i <- 0L to 3L) yield
      (d, i, 2500L, 5000L, if (d == "a") 2500L else 10000L)
    assert(got == expect)
  }

  test("markovEval: trains on pre-split transitions only; cold-start prev scores 0 with NULL model") {
    val s2 = spark
    import s2.implicits._
    def ev(u: Long, id: Long, t: String, day: Int, sec: Int) =
      (u, id, t, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, day, 10, 0, sec)))
    // train (before 01-16): A->B twice, A->C once  => model A -> B
    // eval  (after):        A->B (hit), A->C (miss), D->A (cold start)
    val events = Seq(
      ev(1, 1, "A", 10, 0), ev(1, 2, "B", 10, 10),
      ev(2, 3, "A", 11, 0), ev(2, 4, "B", 11, 10),
      ev(3, 5, "A", 12, 0), ev(3, 6, "C", 12, 10),
      ev(4, 7, "A", 20, 0), ev(4, 8, "B", 20, 10),
      ev(5, 9, "A", 21, 0), ev(5, 10, "C", 21, 10),
      ev(6, 11, "D", 22, 0), ev(6, 12, "A", 22, 10)
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Market.markovEval(events, "2024-01-16").collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getAs[Long]("n_eval"),
          r.getAs[Long]("n_correct"), r.getAs[Long]("acc_bp")))).toMap
    assert(got("A") == ((Some("B"), 2L, 1L, 5000L)))
    assert(got("D") == ((None, 1L, 0L, 0L)), "cold-start must score 0")
    assert(got.size == 2)
  }

  test("revenuePareto: tie-respecting tiers, Lorenz cumulative, exact Gini") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (1L, 0.6), (1L, 0.4), // customer 1: 100 cents
      (2L, 2.0), (3L, 3.0), (4L, 4.0)
    ).toDF("o_custkey", "o_totalprice")
    val got = Retention.revenuePareto(orders, 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // asc 100,200,300,400: Gini = (2*3000 - 5*1000)/(4*1000) = 2500bp
    assert(got == Seq(
      (1L, 2L, 700L, 7000L, 7000L, 2500L),
      (2L, 2L, 300L, 3000L, 10000L, 2500L)))
    // tie group lands whole: three equal customers in 2 tiers -> the
    // tie bin goes entirely to the tier of its LAST desc rank
    val tied = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0))
      .toDF("o_custkey", "o_totalprice")
    val g2 = Retention.revenuePareto(tied, 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq((2L, 3L, 300L, 10000L, 10000L, 0L)))
  }

  test("engagementAuc: hand AUC with a tie pair; doubled midranks exact") {
    val s2 = spark
    import s2.implicits._
    def evs(u: Long, views: Int, purchase: Boolean) =
      (1 to views).map(i => (u, s"v$i", "view")) ++
        (if (purchase) Seq((u, "p", "purchase")) else Nil)
    // pos activity {3, 5}, neg {1, 2, 3}: U = 5.5 of 6 -> 9166 bp
    val events = (evs(1, 3, true) ++ evs(2, 1, false) ++ evs(3, 2, false) ++
      evs(4, 5, true) ++ evs(5, 3, false))
      .map { case (u, id, t) => (u, s"$u-$id", t) }
      .toDF("user_id", "event_id", "event_type")
    val out = Experiment.engagementAuc(events).collect().head
    assert((out.getAs[Long]("n_users"), out.getAs[Long]("n_pos"),
      out.getAs[Long]("n_neg"), out.getAs[Long]("auc_bp")) ==
      ((5L, 2L, 3L, 9166L)))
  }

  test("quarterlyPivot/quarterlyLong: declared quarter domain, zeros kept, lossless round-trip") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (1L, "1997-01-15", 1.0), (1L, "1997-02-10", 2.0),
      (1L, "1997-07-01", 3.0), (2L, "1997-10-05", 4.0),
      (1L, "1996-05-05", 99.0) // out-of-year: excluded
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, 10L), (2L, 20L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((10L, "A"), (20L, "B")).toDF("n_nationkey", "n_name")
    val wide = Retention.quarterlyPivot(orders, customer, nation, 1997)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(wide == Seq(
      ("A", 300L, 0L, 300L, 0L, 600L),
      ("B", 0L, 0L, 0L, 400L, 400L)))
    val long = Retention.quarterlyLong(orders, customer, nation, 1997)
      .as[(String, Long, Long)].collect().toSeq
    assert(long == Seq(
      ("A", 1L, 300L), ("A", 2L, 0L), ("A", 3L, 300L), ("A", 4L, 0L),
      ("B", 1L, 0L), ("B", 2L, 0L), ("B", 3L, 0L), ("B", 4L, 400L)))
  }

  test("ewmaRevenue: dyadic weights, gap day contributes zero, spike bp") {
    val s2 = spark
    import s2.implicits._
    // W=2: weights (2,1), kernel mass 3; day 2 dark, day 3 isolated
    val orders = Seq(
      ("2024-01-01", 3.0), ("2024-01-02", 6.0), ("2024-01-04", 3.0)
    ).toDF("o_orderdate", "o_totalprice")
    val got = Retention.ewmaRevenue(orders, 2)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      // day1: 300*2/3 = 200; spike 300/200
      ("2024-01-01", 300L, 200L, Some(15000L)),
      // day2: (600*2 + 300*1)/3 = 500; spike 600/500
      ("2024-01-02", 600L, 500L, Some(12000L)),
      // day4: the dark day 3 contributed ZERO mass; own 300*2/3 = 200
      ("2024-01-04", 300L, 200L, Some(15000L))))
  }

  test("signalKappa: parity with signalAgreement cells; degenerate marginals -> NULL") {
    val s2 = spark
    import s2.implicits._
    val docs = (1 to 30).map { i =>
      val longToks = Seq.fill(5 + i % 25)(s"token$i").mkString(" ")
      val shortToks = Seq.fill(i % 7)("ab").mkString(" ")
      (i.toLong, s"$longToks $shortToks".trim)
    }.toDF("doc_id", "text")
    val cells = TextAnalysis.signalAgreement(docs).collect()
      .map(r => (r.getAs[Int]("heuristic_ok").toLong,
        r.getAs[Int]("classifier_keep").toLong, r.getAs[Long]("n_docs")))
    val n = cells.map(_._3).sum
    val rh = cells.filter(_._1 == 1L).map(_._3).sum
    val rc = cells.filter(_._2 == 1L).map(_._3).sum
    val d = cells.filter(c => c._1 == c._2).map(_._3).sum
    val ss = rh * rc + (n - rh) * (n - rc)
    val out = TextAnalysis.signalKappa(docs).collect().head
    assert(out.getAs[Long]("n_docs") == n)
    assert(out.getAs[Long]("n_agree") == d)
    assert(out.getAs[Long]("po_bp") ==
      math.floor(10000.0 * d / n).toLong)
    assert(out.getAs[Long]("pe_bp") ==
      math.floor(10000.0 * ss / (n * n)).toLong)
    if (n * n == ss) assert(out.isNullAt(out.fieldIndex("kappa_bp")))
    else assert(out.getAs[Long]("kappa_bp") ==
      math.floor(10000.0 * (n * d - ss) / (n * n - ss)).toLong)
    // degenerate marginals: every doc lands in the SAME (h, c) cell.
    // Short texts pin h = 0; pick a classifier-reject text (c = 0) so
    // rh = rc = 0 and pe = 1 -> kappa undefined, NULL
    val cand = (1 to 30).map(i => (i.toLong, s"neg$i token$i word$i"))
      .toDF("doc_id", "text")
    val negText = TextAnalysis.qualityClassifier(cand)
      .filter(col("keep") === 0).select("doc_id").as[Long].collect()
      .headOption.map(i => s"neg$i token$i word$i")
      .getOrElse(fail("no negative-score candidate in 30 draws"))
    val dup = Seq((1L, negText), (2L, negText)).toDF("doc_id", "text")
    val nul = TextAnalysis.signalKappa(dup).collect().head
    assert(nul.getAs[Long]("pe_bp") == 10000L)
    assert(nul.isNullAt(nul.fieldIndex("kappa_bp")))
  }

  test("chiSquareLift: hand 2x2 closed form, significance gate, empty margin -> NULL") {
    val s2 = spark
    import s2.implicits._
    // first 3 user ids of each md5 arm
    val ids = (1L to 50L)
    val as = ids.filter(armOf(_) == "A").take(3).toSeq
    val bs = ids.filter(armOf(_) == "B").take(3).toSeq
    def events(convA: Int, convB: Int) =
      (as.zipWithIndex.map { case (u, i) =>
        (u, if (i < convA) "purchase" else "view")
      } ++ bs.zipWithIndex.map { case (u, i) =>
        (u, if (i < convB) "purchase" else "view")
      }).toDF("user_id", "event_type")
    // A converts 3/3, B 0/3: det = 9, den = 81, chi2 = 60000 (sig)
    val hot = Experiment.chiSquareLift(events(3, 0)).collect().head
    assert((hot.getAs[Long]("n_a"), hot.getAs[Long]("n_b"),
      hot.getAs[Long]("conv_a"), hot.getAs[Long]("conv_b")) ==
      ((3L, 3L, 3L, 0L)))
    assert(hot.getAs[Long]("chi2_bp") == 60000L)
    assert(hot.getAs[Int]("significant") == 1)
    // A converts 2/3, B 0/3: det = 6, den = 3*3*2*4 = 72 -> 30000 (not)
    val mild = Experiment.chiSquareLift(events(2, 0)).collect().head
    assert(mild.getAs[Long]("chi2_bp") == 30000L)
    assert(mild.getAs[Int]("significant") == 0)
    // nobody converts: a zero margin -> test undefined, NULL
    val flat = Experiment.chiSquareLift(events(0, 0)).collect().head
    assert(flat.isNullAt(flat.fieldIndex("chi2_bp")))
    assert(flat.isNullAt(flat.fieldIndex("significant")))
  }

  test("quantileNormalize: midrank CDF per type, ties share one bp, nulls dropped") {
    val s2 = spark
    import s2.implicits._
    val events = Seq(
      ("x", Some(1.0)), ("x", Some(1.0)), ("x", Some(1.0)),
      ("x", Some(2.0)), ("y", Some(5.0)), ("y", None)
    ).toDF("event_type", "value")
    val got = TrainingPrep.quantileNormalize(events)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // x: 100 cents x3 -> (0*2+3)/8; 200 cents -> (3*2+1)/8
      ("x", 100L, 3L, 3750L), ("x", 200L, 1L, 8750L),
      ("y", 500L, 1L, 5000L)))
  }

  test("kcore: tail peels off, triangle survives; budget exhaustion reports unconverged") {
    val s2 = spark
    import s2.implicits._
    // triangle {1,2,3} with a pendant 4
    val tri = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L), (3L, 4L, 1L))
      .toDF("item_a", "item_b", "pair_sessions")
    val got = Graph.kcore(tri, k = 2, iters = 2).collect().head
    assert((got.getAs[Long]("n_core_vertices"), got.getAs[Long]("n_core_edges"),
      got.getAs[Long]("min_core_deg"), got.getAs[Int]("converged")) ==
      ((3L, 3L, 2L, 1)))
    // a path has no 2-core: peeling empties it (NULL min degree)
    val path = Seq((1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("item_a", "item_b", "pair_sessions")
    val empty = Graph.kcore(path, k = 2, iters = 2).collect().head
    assert(empty.getAs[Long]("n_core_vertices") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("min_core_deg")))
    assert(empty.getAs[Int]("converged") == 1)
    // 5-chain, one round only: endpoints peel, residual is NOT a core
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
      .toDF("item_a", "item_b", "pair_sessions")
    val partial = Graph.kcore(chain, k = 2, iters = 1).collect().head
    assert(partial.getAs[Long]("n_core_vertices") == 3L)
    assert(partial.getAs[Long]("min_core_deg") == 1L)
    assert(partial.getAs[Int]("converged") == 0)
  }

  test("burstiness: VMR on the global span; dark days are implicit zeros") {
    val s2 = spark
    import s2.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1 + day, 12, 0, 0))
    // global span = days 0..2 (3 days)
    val events = Seq(
      ("a", ts(0)), ("a", ts(0)), ("a", ts(2)), ("a", ts(2)), // 2,0,2
      ("b", ts(0)), ("b", ts(1)), ("b", ts(2)),               // 1,1,1
      ("c", ts(0)), ("c", ts(0)), ("c", ts(0))                // 3,0,0
    ).toDF("event_type", "ts")
    val got = Retention.burstiness(events)
      .as[(String, Long, Long, Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      // a: (3*8-16)/(3*4) -> 6666 bp; mean 4/3 -> 1333 mpd
      ("a", 3L, 2L, 4L, 1333L, 6666L, 0),
      // b: metronome -> 0 bp
      ("b", 3L, 3L, 3L, 1000L, 0L, 0),
      // c: one spike -> (3*9-9)/(3*3) = 2.0 -> overdispersed
      ("c", 3L, 1L, 3L, 1000L, 20000L, 1)))
  }

  test("bloomPruningAudit: zone by range, bloom by JVM-recomputed membership, no false negatives") {
    val s2 = spark
    import s2.implicits._
    val m = 1024L
    def jvmH(v: Long, start: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(start - 1, start + 4), 16) % m
    }
    // cellBits=1 over a in {0,1}: cell = a. cell0 holds b {1,100},
    // cell1 holds b {2,99}
    val df = Seq((0L, 1L), (0L, 100L), (1L, 2L), (1L, 99L))
      .toDF("a", "b")
    val got = Layout.bloomPruningAudit(df, "a", "b", cellBits = 1,
      mBits = m, probes = 4).collect()
      .map(r => r.getAs[Long]("probe_b") ->
        ((r.getAs[Long]("n_cells"), r.getAs[Long]("zone_cells"),
          r.getAs[Long]("zone_rows"), r.getAs[Long]("bloom_cells"),
          r.getAs[Long]("exact_cells"), r.getAs[Long]("fp_cells")))).toMap
    assert(got.keySet == Set(1L, 2L, 99L, 100L))
    val cellBits = Map(
      0L -> Set(1L, 100L).flatMap(v => Set(jvmH(v, 1), jvmH(v, 6))),
      1L -> Set(2L, 99L).flatMap(v => Set(jvmH(v, 1), jvmH(v, 6))))
    got.foreach { case (v, (nCells, zc, zr, bc, ec, fp)) =>
      assert(nCells == 2L)
      // zone: cell0 spans [1,100], cell1 [2,99]
      val zExp = Seq(0L -> (1L <= v && v <= 100L),
        1L -> (2L <= v && v <= 99L)).count(_._2)
      assert(zc == zExp && zr == 2L * zExp, s"zone at probe $v")
      val bExp = cellBits.count { case (_, bits) =>
        Set(jvmH(v, 1), jvmH(v, 6)).subsetOf(bits) }
      assert(bc == bExp, s"bloom at probe $v")
      assert(ec == 1L, s"exact at probe $v")
      assert(bc >= ec && fp == bc - ec, s"no-false-negative at probe $v")
    }
  }

  test("covisBacktest: shelf hit, covered miss, cold-start miss; self-transitions excluded") {
    val s2 = spark
    import s2.implicits._
    def ev(id: Long, u: Long, day: Int, sec: Int, item: Long) =
      (id, Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, day, 10, 0, sec)),
        u, "view", s"""{"k": $item}""")
    val events = Seq(
      // train (< Jan 16): u1 basket {10,11}; u2 basket {10,11,12}
      ev(1, 1, 10, 0, 10), ev(2, 1, 10, 10, 11),
      ev(3, 2, 11, 0, 10), ev(4, 2, 11, 10, 11), ev(5, 2, 11, 20, 12),
      // eval (>= Jan 16): u3 items 10,10,11,13 -> 10->10 (self, drop),
      // 10->11 (hit), 11->13 (covered miss); u4 50->60 (cold start)
      ev(6, 3, 20, 0, 10), ev(7, 3, 20, 10, 10), ev(8, 3, 20, 20, 11),
      ev(9, 3, 20, 30, 13),
      ev(10, 4, 21, 0, 50), ev(11, 4, 21, 10, 60)
    ).toDF("event_id", "ts", "user_id", "event_type", "props")
    val out = Market.covisBacktest(events, "2024-01-16", k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // shelf(10) = [11 (w2), 12 (w1)]; 10->11 hits; 11->13 covered
    // miss; 50->60 uncovered
    assert(out == ((3L, 2L, 1L, 3333L, 5000L)))
  }

  test("rollingUsersSketch: exact multi-window waus; sketch verdicts pass at tiny cardinality") {
    val s2 = spark
    import s2.implicits._
    val events = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (2L, "2024-01-01 11:00:00"), (3L, "2024-01-03 09:00:00")
    ).toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val got = Retention.rollingUsersSketch(events, Seq(2, 3))
      .as[(String, Long, Long, Long, Int, Int)].collect().toSeq
    assert(got == Seq(
      // d1: dau {1,2}; wau2 = wau3 = {1,2}
      ("2024-01-01", 2L, 2L, 2L, 1, 1),
      // d2: dau {1}; 2-day {1,2}; 3-day {1,2}
      ("2024-01-02", 1L, 2L, 2L, 1, 1),
      // d3: dau {3}; 2-day {1,3} (d2,d3); 3-day {1,2,3}
      ("2024-01-03", 1L, 2L, 3L, 1, 1)))
  }

  test("diffInDiff: control delta absorbs the trend; did carried on both rows") {
    val s2 = spark
    import s2.implicits._
    val region = Seq((0L, "ASIA"), (1L, "AMERICA"), (2L, "EUROPE"))
      .toDF("r_regionkey", "r_name")
    val nation = Seq((10L, 0L), (11L, 1L), (12L, 2L))
      .toDF("n_nationkey", "n_regionkey")
    val customer = Seq((1L, 10L), (2L, 11L), (3L, 12L))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, "1997-05-01", 100.0), (1L, "1997-06-01", 200.0), // treat pre
      (1L, "1998-05-01", 400.0),                            // treat post
      (2L, "1997-05-01", 100.0),                            // ctrl pre
      (2L, "1998-05-01", 150.0),                            // ctrl post
      (3L, "1997-05-01", 999.0)                             // excluded region
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Experiment.diffInDiff(orders, customer, nation, region)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("CTRL", 1L, 1L, 10000L, 15000L, 5000L, 20000L),
      ("TREAT", 2L, 1L, 15000L, 40000L, 25000L, 20000L)))
  }

  test("timeoutSweep: sessions = first events + super-threshold gaps, one lag multiset") {
    val s2 = spark
    import s2.implicits._
    val t0 = 1700000000L
    val events = Seq(
      (1L, 1L, t0), (2L, 1L, t0 + 30L), (3L, 1L, t0 + 200L),
      (4L, 2L, t0)
    ).toDF("event_id", "user_id", "secs")
      .withColumn("ts", col("secs").cast("timestamp")).drop("secs")
    val got = Sessionize.timeoutSweep(events, Seq(10L, 100L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // gaps: u1 -> (null, 30s, 170s), u2 -> (null)
    assert(got == Seq(
      (10L, 4L, 4L, 1000L),   // both gaps exceed 10s
      (100L, 3L, 4L, 1333L))) // only the 170s gap exceeds 100s
  }

  test("readability: hand-computed Flesch milli terms on one doc") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "Hello world. This is fine.", "s"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.readability(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // w=5, sentence runs=2, vowel runs=7 (he-llo:2, world:1, this:1,
    // is:1, fine:2), syl=max(7,5)=7
    // flesch = 206835 - (1015*5)DIV2 - (84600*7)DIV5
    //        = 206835 - 2537 - 118440 = 85858
    assert(got == Seq(("s", 1L, 85858L, 2500L, 1400L, 0L)))
  }

  test("bigramPerplexity: add-1 bits per bigram; flag fires over 105% of corpus mean") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "a b a b", "s"), (2L, "a b c", "s"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.bigramPerplexity(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // c2: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V=3
    // bits(a,b)=⌊log2(6/4)⌋=0; bits(b,a)=⌊log2(5/2)⌋=1; bits(b,c)=1
    // d1: nb=3 sb=1 bpt=333; d2: nb=2 sb=1 bpt=500; mean=(1000*2)DIV5=400
    // flag at 105%: d2 only (50000 > 42000)
    assert(got == Seq(("s", 2L, 5L, 400L, 400L, 1L, 5000L)))
  }

  test("anisotropy: axis-concentrated cloud scores high; zero mean vector -> NULL") {
    val s2 = spark
    import s2.implicits._
    val e1 = Seq(
      (1L, Seq(0.5f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.3f, 0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r1 = Similarity.anisotropy(e1, dim = 4).collect().head
    // q=(500,100,0,0),(300,100,0,0): S=(800,200,0,0), bprime=40000,
    // s2=680000, p=(420000,260000), A=2.56e10 ->
    // bp = 10000*A // (s2*bprime) = 9411; excess = 1000*9411 DIV 2500
    assert(r1.getAs[Long]("n_vecs") == 2L)
    assert(r1.getAs[Long]("var_explained_bp") == 9411L)
    assert(r1.getAs[Long]("isotropy_bp") == 2500L)
    assert(r1.getAs[Long]("excess_milli") == 3764L)
    val e2 = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r2 = Similarity.anisotropy(e2, dim = 4).collect().head
    assert(r2.isNullAt(r2.fieldIndex("var_explained_bp")),
      "zero mean direction must yield NULL, not a division blowup")
  }

  test("brownForecast: W=2 hand walk — dense spine, dark day, clamped forecast, edge NULLs") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      ("2024-01-01", 3.0), ("2024-01-02", 6.0), ("2024-01-04", 3.0)
    ).toDF("o_orderdate", "o_totalprice")
    val got = Retention.brownForecast(orders, 2)
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSeq
    assert(got == Seq(
      // s1: 200,500,200,200 ; s2: 133,400,300,200
      ("2024-01-01", 300L, 200L, 133L, 334L, Some(600L), Some(266L),
        Some(4433L)),
      ("2024-01-02", 600L, 500L, 400L, 700L, Some(0L), Some(700L), None),
      ("2024-01-03", 0L, 200L, 300L, 0L, Some(300L), Some(300L),
        Some(10000L)),
      ("2024-01-04", 300L, 200L, 200L, 200L, None, None, None)))
  }

  test("bootstrapCi: full JVM twin of draws, weights, replicate rates, and interval picks") {
    val s2 = spark
    import s2.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def draw32(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
    def weight(d: Long): Long = {
      val i = Experiment.PoissonCdf32.indexWhere(d < _)
      if (i < 0) Experiment.PoissonCdf32.length.toLong else i.toLong
    }
    // 60 users; purchase iff user % 3 == 0
    val users = (1L to 60L)
    val events = users.flatMap { u =>
      Seq((u, "view")) ++ (if (u % 3 == 0) Seq((u, "purchase")) else Nil)
    }.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, u, Timestamp.valueOf("2024-01-01 10:00:00"), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val got = Experiment.bootstrapCi(events).collect().head
    // twin
    val pos = users.map(u => u -> (if (u % 3 == 0) 1L else 0L)).toMap
    val arm = users.map(u => u -> armOf(u)).toMap
    def rate(cw: Long, nw: Long): Option[Long] =
      if (nw > 0) Some(math.floor(10000.0 * cw / nw).toLong) else None
    val deltas = (0 until 32).flatMap { b =>
      val ws = users.map(u => u -> weight(draw32(s"${u}_$b"))).toMap
      val (na, ca) = (users.filter(arm(_) == "A").map(ws).sum,
        users.filter(arm(_) == "A").map(u => ws(u) * pos(u)).sum)
      val (nb, cb) = (users.filter(arm(_) == "B").map(ws).sum,
        users.filter(arm(_) == "B").map(u => ws(u) * pos(u)).sum)
      for (ra <- rate(ca, na); rb <- rate(cb, nb)) yield ra - rb
    }.sorted
    val obs = {
      val a = users.filter(arm(_) == "A")
      val b = users.filter(arm(_) == "B")
      rate(a.map(pos).sum, a.size.toLong).get -
        rate(b.map(pos).sum, b.size.toLong).get
    }
    assert(got.getAs[Long]("n_users") == 60L)
    assert(got.getAs[Long]("obs_delta_bp") == obs)
    assert(got.getAs[Long]("n_reps") == deltas.length.toLong)
    assert(got.getAs[Long]("boot_lo_bp") == deltas(1))
    assert(got.getAs[Long]("boot_med_bp") == deltas(deltas.length / 2 - 1))
    assert(got.getAs[Long]("boot_hi_bp") == deltas(deltas.length - 2))
    assert(got.getAs[Int]("covers_zero") ==
      (if (deltas(1) <= 0 && deltas(deltas.length - 2) >= 0) 1 else 0))
  }

  test("supplierSkyline: dominated supplier dropped by the sort-scan") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (10L, "2024-01-01"), (11L, "2024-01-01"), (12L, "2024-01-01")
    ).toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      // s1: unit 100c, delay 5d; s2: unit 200c, delay 3d;
      // s3: unit 150c, delay 7d -> dominated by s1
      (10L, 1L, 1.0, 1.00, "2024-01-06"),
      (11L, 2L, 1.0, 2.00, "2024-01-04"),
      (12L, 3L, 1.0, 1.50, "2024-01-08")
    ).toDF("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_shipdate")
    val got = Market.supplierSkyline(lineitem, orders)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 1L, 1L, 100L, 5000L),
      (2, 2L, 1L, 200L, 3000L)))
  }

  test("quantileForecast: W=2 hand picks, pinball means, coverage shares") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      ("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0),
      ("2024-01-05", 5.0) // day 4 dark -> zero on the spine
    ).toDF("o_orderdate", "o_totalprice")
    val got = Retention.quantileForecast(orders, 2, Seq(5000L, 9000L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // full windows: d3 [100,200], d4 [200,300], d5 [0,300]
    // q50 rank 1 preds (100,200,0): losses (100,100,250) mean 150, cov 1/3
    // q90 rank 2 preds (200,300,300): losses (90,30,180) mean 100, cov 1/3
    assert(got == Seq(
      (5000L, 3L, 150L, 3333L),
      (9000L, 3L, 100L, 3333L)))
  }

  test("markovAttribution: removal kills the routed reach; credits normalize") {
    val s2 = spark
    import s2.implicits._
    def e(id: Long, u: Long, sec: Int, t: String) =
      (id, u, Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d"), t)
    val events = Seq(
      e(1, 1, 0, "view"), e(2, 1, 10, "click"), e(3, 1, 20, "purchase"),
      e(4, 2, 0, "view"), e(5, 2, 10, "click"),
      e(6, 3, 0, "click"), e(7, 3, 10, "purchase"),
      e(8, 4, 0, "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Market.markovAttribution(events, Seq("click", "view"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // chain: view->click (1.0), click->purchase (1.0); starts view×3,
    // click×1 -> p_full = 10000. Remove click: chain empty, p = 0,
    // removal 10000. Remove view: only click-start survives, p = 2500,
    // removal 7500. credits 10000/17500 and 7500/17500.
    assert(got == Seq(
      ("click", 10000L, 0L, 10000L, 5714L),
      ("view", 10000L, 2500L, 7500L, 4285L)))
  }

  test("seasonalBrownBacktest: JVM twin of the split, index, and both reports") {
    val s2 = spark
    import s2.implicits._
    val w = 2
    // 30 consecutive days with a strong dow signal
    val cents = (0 until 30).map(i => (i, ((i % 7) + 1) * 1000L))
    val orders = cents.map { case (i, c) =>
      (java.time.LocalDate.ofEpochDay(19700L + i).toString, c / 100.0)
    }.toDF("o_orderdate", "o_totalprice")
    val got = Retention.seasonalBrownBacktest(orders, w)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    // twin
    val mn = 19700L; val mx = 19729L; val mid = mn + (mx - mn) / 2
    val y = cents.map { case (i, c) => (19700L + i) -> c }.toMap
    def s1(d: Long) = (2 * y(d) + (if (d > mn) y(d - 1) else 0L)) / 3
    def s2f(d: Long) = (2 * s1(d) + (if (d > mn) s1(d - 1) else 0L)) / 3
    def f(d: Long) = math.max(3 * s1(d) - 2 * s2f(d), 0L)
    val train = (mn to mid).map(d => d -> y(d))
    val m = train.map(_._2).sum / train.size
    val idx = (0L to 6L).map { dow =>
      val ds = train.filter(_._1 % 7 == dow)
      dow -> (if (m > 0) (10000L * (ds.map(_._2).sum / ds.size)) / m
              else 10000L)
    }.toMap
    val ev = ((mid + 1) to (mx - 1)).map { d =>
      (y(d + 1), f(d), (f(d) * idx((d + 1) % 7)) / 10000L)
    }
    def rep(pick: ((Long, Long, Long)) => Long) = {
      val ae = ev.map(e => math.abs(pick(e) - e._1)).sum
      (ev.size.toLong, ae / ev.size, (10000L * ae) / ev.map(_._1).sum)
    }
    val (n, maeB, wmB) = rep(_._2)
    val (_, maeD, wmD) = rep(_._3)
    assert(got == Seq(
      ("brown", n, maeB, Some(wmB)),
      ("brown_dow", n, maeD, Some(wmD))))
  }

  test("negativeSampling: nested-isqrt ¾ weights, REST rollup closes the CDF") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = TrainingPrep.negativeSampling(docs, topK = 2)
      .as[(Int, String, Long, Long, Long, Long)].collect().toSeq
    // w34: a=⌊√(4·2)⌋=2, b=⌊√(2·1)⌋=1, c=1; total 4
    assert(got == Seq(
      (1, "a", 4L, 2L, 500000L, 500000L),
      (2, "b", 2L, 1L, 250000L, 750000L),
      (3, "<REST>", 1L, 1L, 250000L, 1000000L)))
  }

  test("bloomSemiAudit: JVM bloom twin; no false negatives by construction") {
    val s2 = spark
    import s2.implicits._
    val build = (1L to 40L).filter(_ % 4 == 0).toDF("bk")
    val fact = (1L to 200L).map(i => i % 50L).toDF("fk")
    val r = graft.ops.Joins.bloomSemiAudit(fact, build, "fk", "bk",
      mBits = 256L).collect().head
    // JVM twin: same 2x 20-bit md5 hashes mod 256
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(d: String, start: Int) =
      java.lang.Long.parseLong(d.substring(start - 1, start + 4), 16) % 256L
    val bits = (1L to 40L).filter(_ % 4 == 0).flatMap { k =>
      val d = md5hex(k.toString); Seq(h(d, 1), h(d, 6))
    }.toSet
    val facts = (1L to 200L).map(_ % 50L)
    val pass = facts.count { k =>
      val d = md5hex(k.toString); bits(h(d, 1)) && bits(h(d, 6))
    }
    val exact = facts.count(k => k % 4 == 0 && k >= 4 && k <= 40)
    assert(r.getAs[Long]("n_fact") == 200L)
    assert(r.getAs[Long]("n_build_keys") == 10L)
    assert(r.getAs[Long]("n_bloom_pass") == pass.toLong)
    assert(r.getAs[Long]("n_exact") == exact.toLong)
    assert(r.getAs[Long]("n_bloom_pass") >= r.getAs[Long]("n_exact"),
      "a bloom can never reject a member")
  }

  test("crossCorrelation matches a JVM twin on a lagged engineered series") {
    val s2 = spark
    import s2.implicits._
    // y lags x by one day: y_t = 100*x_{t-1} cents (integer-dollar
    // prices keep floor(v*100) exact); x alternates with a kick
    val n = 30
    val xs = (0 until n).map(t => 1L + (t % 2) + (if (t % 11 == 0) 2 else 0))
    val ys = (0 until n).map(t => if (t == 0) 300L else 100L * xs(t - 1))
    val orders = (0 until n).flatMap { t =>
      (0 until xs(t).toInt).map(_ =>
        (f"2024-01-${t + 1}%02d", ys(t) / 100.0))
    }.toDF("o_orderdate", "o_totalprice")
    val lags = Seq(-1, 0, 1)
    val got = Retention.crossCorrelation(orders, lags)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // JVM twin
    val mx = xs.sum / n; val my = ys.sum / n
    val dx = xs.map(_ - mx); val dy = ys.map(_ - my)
    val vx = dx.map(d => BigInt(d) * d).sum
    val vy = dy.map(d => BigInt(d) * d).sum
    lags.foreach { l =>
      val pairs = if (l >= 0) (0 until n - l).map(t => (dx(t), dy(t + l)))
        else (0 until n + l).map(t => (dx(t - l), dy(t)))
      val nn = pairs.map { case (a, b) => BigInt(a) * b }.sum
      val r = math.floor(10000.0 * nn.toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))).toLong
      assert(got(l.toLong) == ((pairs.size.toLong, Some(r))), s"lag $l")
    }
    // the planted structure: x leads y, so r(+1) must dominate r(0)
    assert(got(1L)._2.get > got(0L)._2.get)
  }

  test("varianceDecomposition matches a BigInt recompute; constant series is null") {
    val s2 = spark
    import s2.implicits._
    val wd = 4
    val days = 0 until 28
    // quarter-dollar grid: cents/100.0 is binary-exact, so the house
    // floor(x*100) convention reproduces cents(i) bit-for-bit
    val cents = days.map(i => 25L * (4 + (i % 7) * 2 + i / 7))
    val orders = days.map(i =>
      (f"2024-01-${i + 1}%02d", cents(i) / 100.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = Retention.varianceDecomposition(orders, wd).collect().head
    // JVM twin
    val w = wd
    val denom = (1L << w) - 1L
    val trend = days.map { t =>
      val lo = math.max(0, t - (w - 1))
      (lo to t).map(s => BigInt(cents(s)) << (w - 1 - (t - s))).sum / denom
    }
    val det = days.map(t => BigInt(cents(t)) - trend(t))
    def tmean(xs: Seq[BigInt]) = xs.sum / xs.size // BigInt / truncates
    val seas = (0 until 7).map { d =>
      val g = days.filter(i => ((i + 19723) % 7) == d).map(det(_))
      // daynum for 2024-01-01 is 19723; dow = daynum % 7
      d -> (if (g.isEmpty) BigInt(0) else tmean(g))
    }.toMap
    val rem = days.map(i => det(i) - seas(((i + 19723) % 7)))
    def varOf(xs: Seq[BigInt]) = { val m = tmean(xs); xs.map(x => (x - m) * (x - m)).sum }
    val (vt, vd, vr) = (varOf(cents.map(BigInt(_))), varOf(det), varOf(rem))
    assert(got.getAs[Long]("n_days") == 28L)
    assert(got.getAs[Long]("trend_share_bp") ==
      ((BigInt(10000) * (vt - vd)) / vt).toLong)
    assert(got.getAs[Long]("seasonal_share_bp") ==
      ((BigInt(10000) * (vd - vr)) / vt).toLong)
    assert(got.getAs[Long]("remainder_share_bp") ==
      ((BigInt(10000) * vr) / vt).toLong)
    // constant revenue: zero total variance -> null shares
    val flat = days.map(i => (f"2024-01-${i + 1}%02d", 2.0))
      .toDF("o_orderdate", "o_totalprice")
    val f = Retention.varianceDecomposition(flat, wd).collect().head
    assert(f.isNullAt(f.fieldIndex("trend_share_bp")))
  }

  test("priceIndex: base month reads 10000 exactly; matched-basket rule; doubled price") {
    val s2 = spark
    import s2.implicits._
    val li = Seq(
      // Jan: part1 unit 10.00 x10, part2 unit 20.00 x10
      (1L, "1995-01-10", 100.0, 10.0),
      (2L, "1995-01-11", 200.0, 10.0),
      // Feb: part1 price DOUBLES, part2 flat, part3 unmatched (excluded)
      (1L, "1995-02-10", 200.0, 10.0),
      (2L, "1995-02-11", 200.0, 10.0),
      (3L, "1995-02-12", 999.0, 1.0)
    ).toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
    val got = AreaTopProducts.priceIndex(li).collect()
      .map(r => r.getAs[String]("month") ->
        ((r.getAs[Long]("n_matched_parts"), r.getAs[Long]("laspeyres_bp"),
          r.getAs[Long]("paasche_bp"), r.getAs[Long]("fisher_bp")))).toMap
    assert(got("1995-01") == ((2L, 10000L, 10000L, 10000L)))
    // L = (20000+20000)/(10000+20000) = 13333bp; same basket -> P = L
    assert(got("1995-02") == ((2L, 13333L, 13333L, 13333L)))
  }

  test("knnLabelAccuracy: clustered labels score perfectly; a mislabeled point dents its class") {
    val s2 = spark
    import s2.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0f), 1), (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.95f, 0.05f), 1),
      (4L, Seq(0f, 1.0f), 2), (5L, Seq(0.1f, 0.9f), 2),
      (6L, Seq(0.05f, 0.95f), 2),
      (7L, Seq(0f, 0.99f), 1) // sits in cluster 2, labeled 1
    ).toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity
      .knnLabelAccuracy(emb, col("vec_id") >= 1L, k = 2)
      .collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_probes"), r.getAs[Long]("n_correct"),
          r.getAs[Long]("acc_bp")))).toMap
    // label 1: probes 1,2,3 vote label-1; probe 7's neighbors are
    // cluster 2 -> 3/4. label 2: probes 4,5,6 — probe 7 is labeled 1
    // but COSINE-closest to them; top-2 by (cos desc, id asc) still
    // yields a label-2 majority or a 1-1 tie broken to the SMALLER
    // label... ties: each of 4,5,6 sees 7 plus one cluster mate ->
    // 1 vote each -> min label 1 wins -> all three WRONG.
    assert(got(1) == ((4L, 3L, 7500L)))
    assert(got(2)._1 == 3L)
  }

  test("spendTierMigration: hand months pin upgrades, downgrades, and churn") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (1L, "2024-01-05", 1.0), (2L, "2024-01-06", 2.0),
      (3L, "2024-01-07", 3.0), (4L, "2024-01-08", 4.0),
      (1L, "2024-02-05", 4.0), (2L, "2024-02-06", 1.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Retention.spendTierMigration(orders, 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // Jan tiers by spend rank: u1=1, u2=2, u3=3, u4=4. Feb: u2 (100c)
    // tier 1, u1 (400c) tier 3; u3/u4 churn (to 0).
    assert(got == Set(
      (1L, 3L, 1L, 10000L), (2L, 1L, 1L, 10000L),
      (3L, 0L, 1L, 10000L), (4L, 0L, 1L, 10000L)))
  }

  test("scd2 monthEndCensus: month-end cuts + the end-of-span snapshot") {
    val s2 = spark
    import s2.implicits._
    def e(id: Long, u: Long, t: String, typ: String) =
      (id, Timestamp.valueOf(t), u, typ, 1.0, "{}")
    // user 1 opens tier 0 on Jan 30, crosses to tier 1 on Feb 1;
    // user 2 stays tier 0 throughout. Span ends Feb 2 (not a
    // month-end) -> cuts at Jan 31 AND Feb 2.
    val evs = Seq(
      e(0, 1, "2024-01-30 10:00:00", "view"),
      e(1, 1, "2024-01-30 11:00:00", "purchase"),
      e(2, 1, "2024-01-31 10:00:00", "purchase"),
      e(3, 1, "2024-02-01 10:00:00", "purchase"), // crosses 3
      e(4, 2, "2024-01-30 09:00:00", "view"),
      e(5, 2, "2024-02-02 09:00:00", "view")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Scd.monthEndCensus(evs, Seq(3L, 10L, 30L)).collect()
      .map(r => (r.getAs[String]("snapshot_day"), r.getAs[Int]("tier")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got == Map(
      ("2024-01-31", 0) -> 2L,  // both users tier 0 at Jan 31 23:59
      ("2024-02-02", 0) -> 1L,  // user 2 still tier 0
      ("2024-02-02", 1) -> 1L)) // user 1 crossed Feb 1
  }

  test("joinCardinalityAudit: System-R estimate and true size on a hand histogram") {
    val s2 = spark
    import s2.implicits._
    val left = Seq(1L, 1L, 1L, 2L).toDF("k1")
    val right = Seq(1L, 2L, 2L, 3L).toDF("k2")
    val r = Profile.joinCardinalityAudit(left, right, "k1", "k2")
      .collect().head
    // actual = 3*1 + 1*2 = 5; predicted = 4*4 DIV max(2,3) = 5
    assert((r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
      r.getAs[Long]("ndv_left"), r.getAs[Long]("ndv_right"),
      r.getAs[Long]("actual_rows"), r.getAs[Long]("predicted_rows"),
      r.getAs[Long]("q_error_milli"), r.getAs[Int]("underestimated")) ==
      ((4L, 4L, 2L, 3L, 5L, 5L, 1000L, 0)))
  }

  test("runsTest: oscillating series rejects, monotone series has one run and null verdict") {
    val s2 = spark
    import s2.implicits._
    val osc = (0 until 8).map { i =>
      (f"2024-01-${i + 1}%02d", if (i % 2 == 0) 1.0 else 3.0)
    }.toDF("o_orderdate", "o_totalprice")
    val r = Retention.runsTest(osc).collect().head
    // 7 alternating moves: 4 up, 3 down, 7 runs; E = 1+24/7;
    // verdict: 10^4·18²·6 = 19.44e6 > 38416·24·17 = 15.67e6 -> reject
    assert((r.getAs[Long]("n_moves"), r.getAs[Long]("n_up"),
      r.getAs[Long]("n_down"), r.getAs[Long]("n_runs"),
      r.getAs[Long]("expected_runs_milli"), r.getAs[Int]("reject_05")) ==
      ((7L, 4L, 3L, 7L, 4428L, 1)))
    val mono = (0 until 8).map { i =>
      (f"2024-01-${i + 1}%02d", (i + 1).toDouble)
    }.toDF("o_orderdate", "o_totalprice")
    val m = Retention.runsTest(mono).collect().head
    assert((m.getAs[Long]("n_moves"), m.getAs[Long]("n_down"),
      m.getAs[Long]("n_runs")) == ((7L, 0L, 1L)))
    assert(m.isNullAt(m.fieldIndex("reject_05")), "one-sided series has Var 0")
  }

  test("ksTest: exact cross-multiplied D and squared-bound verdict match a JVM recompute") {
    val s2 = spark
    import s2.implicits._
    // engineered counts: same trick as the mannWhitney spec — the op
    // only reads user_id, the metric is the per-user row count
    val counts = (1L to 40L).map(u => u -> (1 + ((u * u) % 7)).toInt).toMap
    val events = counts.toSeq.flatMap { case (u, n) =>
      (1 to n).map(_ => u)
    }.toDF("user_id")
    val row = Experiment.ksTest(events).collect().head
    // JVM walk over the value grid
    val byArm = counts.toSeq.map { case (u, m) => (m.toLong, armOf(u)) }
    val nA = byArm.count(_._2 == "A").toLong
    val nB = byArm.size - nA
    var cumA = 0L; var cumB = 0L; var dNum = 0L
    byArm.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      cumA += g.count(_._2 == "A"); cumB += g.count(_._2 == "B")
      dNum = math.max(dNum, math.abs(cumA * nB - cumB * nA))
    }
    assert(row.getAs[Long]("n_a") == nA && row.getAs[Long]("n_b") == nB)
    assert(row.getAs[Long]("d_num") == dNum)
    assert(row.getAs[Long]("d_bp") ==
      math.floor(10000.0 * dNum / (nA * nB)).toLong)
    val reject = BigInt(1000000) * BigInt(dNum) * BigInt(dNum) >
      BigInt(1844164) * BigInt(nA + nB) * BigInt(nA) * BigInt(nB)
    assert(row.getAs[Int]("reject_05") == (if (reject) 1 else 0))
    // identical arms on a symmetric fixture would reject nothing; here
    // just pin D's range
    assert(row.getAs[Long]("d_bp") >= 0L && row.getAs[Long]("d_bp") <= 10000L)
  }

  test("cms heavyHitterCheck: estimates are one-sided and match a JVM sketch") {
    val s2 = spark
    import s2.implicits._
    // small vocab so md5 collisions are reproducible in the JVM twin
    val words = (0 until 40).map(i => s"w$i")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(1 + (i * 13) % 17)(w) }
      .mkString(" ")
    val docs = Seq((1L, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exact = text.split(" ").groupBy(identity).map { case (w, a) =>
      w -> a.length.toLong
    }
    val sketch = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    exact.foreach { case (w, c) =>
      val h = md5hex(w)
      (0 until CountMin.Rows).foreach { j =>
        val b = Integer.parseInt(h.substring(2 * j, 2 * j + 2), 16)
        sketch((j, b)) += c
      }
    }
    def est(w: String): Long = {
      val h = md5hex(w)
      (0 until CountMin.Rows).map { j =>
        sketch((j, Integer.parseInt(h.substring(2 * j, 2 * j + 2), 16)))
      }.min
    }
    val got = CountMin.heavyHitterCheck(docs, topK = 10).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val w = r.getAs[String]("token")
      assert(r.getAs[Long]("exact_cnt") == exact(w))
      assert(r.getAs[Long]("est_cnt") == est(w), s"token $w")
      assert(r.getAs[Long]("over_cnt") >= 0L, "CMS must never underestimate")
    }
    // probe selection: exact top-10 by (count desc, token asc)
    val wantProbes = exact.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(10).map(_._1).toSet
    assert(got.map(_.getAs[String]("token")).toSet == wantProbes)
  }

  test("autocorrelation: alternating series pins r(1)=-8750, r(2)=+7500 exactly") {
    val s2 = spark
    import s2.implicits._
    // 8 days alternating 100/300 cents: mean 200, dev ±100.
    // r(1): 7 products of -10000 -> (10000*-70000) DIV 80000 = -8750
    // r(2): 6 products of +10000 -> (10000*60000) DIV 80000 = 7500
    val orders = (0 until 8).map { i =>
      (f"2024-01-${i + 1}%02d", if (i % 2 == 0) 1.0 else 3.0)
    }.toDF("o_orderdate", "o_totalprice")
    val got = Retention.autocorrelation(orders, Seq(1, 2))
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, 7L, Some(-8750L)), (2L, 6L, Some(7500L))))
  }

  test("autocorrelation matches a BigInt recompute on gapped generated revenue") {
    val s2 = spark
    import s2.implicits._
    // deterministic daily revenue with a weekly pattern and dark days
    val days = (0 until 60).filter(i => i % 11 != 3) // calendar gaps
    val orders = days.map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (d.toString, ((i % 7) * 17 + (i * i) % 23 + 1).toDouble)
    }.toDF("o_orderdate", "o_totalprice")
    val lags = Seq(1, 7)
    val got = Retention.autocorrelation(orders, lags)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // JVM twin over the DENSE spine
    val cents = days.map(i =>
      i.toLong -> (((i % 7) * 17 + (i * i) % 23 + 1).toDouble * 100).floor.toLong).toMap
    val spine = (0 to days.max).map(i => cents.getOrElse(i.toLong, 0L))
    val n = spine.size.toLong
    val m = spine.sum / n // truncated mean (all positive)
    val dev = spine.map(_ - m)
    val den = dev.map(d => BigInt(d) * d).sum
    lags.foreach { l =>
      val pairs = dev.indices.dropRight(l)
      val num = pairs.map(t => BigInt(dev(t)) * dev(t + l)).sum
      val r = (BigInt(10000) * num) / den // BigInt / truncates toward zero
      assert(got(l.toLong) == ((pairs.size.toLong, Some(r.toLong))), s"lag $l")
    }
  }

  test("powerIteration: single-axis corpus converges to share 10000; degenerate corpus is null") {
    val s2 = spark
    import s2.implicits._
    val axis = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f), 0),
      (2L, Seq(-1.0f, 0f, 0f, 0f), 0),
      (3L, Seq(3.0f, 0f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val row = Similarity.powerIteration(axis, dim = 4, iters = 2).collect().head
    assert((row.getAs[Long]("n_vecs"), row.getAs[Int]("n_dims"),
      row.getAs[Long]("top_share_bp"), row.getAs[Long]("isotropy_bp"),
      row.getAs[Long]("excess_milli")) == ((3L, 4, 10000L, 2500L, 4000L)))
    // identical vectors: zero centered variance -> null shares
    val flat = Seq(
      (1L, Seq(1.0f, 1f, 1f, 1f), 0),
      (2L, Seq(1.0f, 1f, 1f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r2 = Similarity.powerIteration(flat, dim = 4, iters = 2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("top_share_bp")))
  }

  test("powerIteration dominates the mean-direction share on the fixture") {
    val top = Queries.powerIteration(spark, sf).collect().head
      .getAs[Long]("top_share_bp")
    val mean = Queries.anisotropy(spark, sf).collect().head
      .getAs[Long]("var_explained_bp")
    // the top principal direction explains at least what the mean
    // direction does (up to the two floors' 1bp each)
    assert(top >= mean - 2, s"top $top < mean-direction $mean")
  }

  test("sketchQuantileTable: bands hold the exact quantiles on a hand histogram") {
    val s2 = spark
    import s2.implicits._
    // cents 1, 2, 5, 100 -> p50 rank 2 = 2c (band 2 = [2,3]),
    // p99 rank 4 = 100c (band 7 = [64,127])
    val df = Seq(("A", 0.01), ("A", 0.02), ("A", 0.05), ("A", 1.00))
      .toDF("g", "v")
    val got = Percentiles.sketchQuantileTable(df, "g", "v",
      Seq(5000L, 9900L)).collect()
      .map(r => r.getAs[Long]("rank_bp") ->
        ((r.getAs[Long]("exact_cents"), r.getAs[Int]("sk_band"),
          r.getAs[Long]("sk_lo_cents"), r.getAs[Long]("sk_hi_cents"),
          r.getAs[Int]("within")))).toMap
    assert(got(5000L) == ((2L, 2, 2L, 3L, 1)))
    assert(got(9900L) == ((100L, 7, 64L, 127L, 1)))
  }

  test("sketchQuantileTable: within holds on every fixture row (structural one-sidedness)") {
    val rows = Queries.sketchQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("within") == 1, r.toString)
      assert(r.getAs[Long]("rel_width_bp") <= 10000L, r.toString)
    }
  }

  test("scd2 tierHistory + revenueByTier: versions, intervals, and PIT reads on hand journeys") {
    val s2 = spark
    import s2.implicits._
    def e(id: Long, u: Long, t: String, typ: String, v: Double = 10.0) =
      (id, Timestamp.valueOf(t), u, typ, v, "{}")
    // user 1: 4 purchases — crosses the 3-threshold on the 3rd
    val evs = Seq(
      e(0, 1, "2024-01-01 00:00:00", "view"),
      e(1, 1, "2024-01-01 01:00:00", "purchase", 1.0),
      e(2, 1, "2024-01-01 02:00:00", "purchase", 2.0),
      e(3, 1, "2024-01-01 03:00:00", "purchase", 4.0), // opens tier 1
      e(4, 1, "2024-01-01 04:00:00", "purchase", 8.0),
      // user 2: two purchases share ONE timestamp, the first crossing
      // tier 1 — both must read in the NEW tier (version rows sort
      // before probe rows at equal ts)
      e(5, 2, "2024-01-02 00:00:00", "purchase", 1.0),
      e(6, 2, "2024-01-02 01:00:00", "purchase", 2.0),
      e(7, 2, "2024-01-02 02:00:00", "purchase", 4.0),
      e(8, 2, "2024-01-02 02:00:00", "purchase", 8.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hist = Scd.tierHistory(evs, Seq(3L, 10L, 30L)).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("tier")) ->
        ((r.getAs[Long]("valid_from_us"), Option(r.get(3)).map(_.toString))))
      .toMap
    def us(t: String) = Timestamp.valueOf(t).getTime * 1000L
    // user 1: tier 0 opens at first event, tier 1 at the 3rd purchase
    assert(hist((1L, 0)) ==
      ((us("2024-01-01 00:00:00"), Some((us("2024-01-01 03:00:00") - 1).toString))))
    assert(hist((1L, 1)) == ((us("2024-01-01 03:00:00"), None)))
    // user 2: same-ts crossing — tier1's version starts at the shared ts
    assert(hist((2L, 1))._1 == us("2024-01-02 02:00:00"))
    val rev = Scd.revenueByTier(evs, Seq(3L, 10L, 30L)).collect()
      .map(r => r.getAs[Int]("tier") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"),
          r.getAs[Long]("revenue_cents")))).toMap
    // tier 0: u1 p1+p2 (300c), u2 p1+p2 (300c); tier 1: u1 p3+p4
    // (1200c), u2 BOTH same-ts purchases read in the new tier (1200c)
    assert(rev == Map(
      0 -> ((4L, 2L, 600L)),
      1 -> ((4L, 2L, 2400L))))
  }

  test("cramersV: perfect association reads 10000bp; independence reads 0; zero cells counted") {
    val s2 = spark
    import s2.implicits._
    // perfect 2x2: a==b on 10 rows → χ² = N = 10, V = 1. Half the
    // grid is ZERO cells — dropping them would read χ² = 5, V ≈ 0.707
    val perfect = (1 to 5).map(_ => ("x", "x")) ++
      (1 to 5).map(_ => ("y", "y"))
    val p = graft.ops.Profile.cramersV(perfect.toDF("a", "b"),
      col("a"), col("b"), "a", "b").collect().head
    assert(p.getAs[Long]("n") == 10L)
    assert(p.getAs[Long]("dof") == 1L)
    assert(p.getAs[Long]("chi2_milli") == 10000L)
    assert(p.getAs[Long]("v_bp") == 10000L)
    // exact independence: every (a, b) combo equally filled → χ² = 0
    val indep = for { a <- Seq("x", "y"); b <- Seq("u", "v", "w");
      _ <- 1 to 2 } yield (a, b)
    val i = graft.ops.Profile.cramersV(indep.toDF("a", "b"),
      col("a"), col("b"), "a", "b").collect().head
    assert(i.getAs[Long]("n") == 12L)
    assert(i.getAs[Long]("r_levels") == 2L &&
      i.getAs[Long]("c_levels") == 3L && i.getAs[Long]("dof") == 2L)
    assert(i.getAs[Long]("chi2_milli") == 0L)
    assert(i.getAs[Long]("v_bp") == 0L)
    // degenerate: single-level column → dof 0, V undefined (null)
    val d = graft.ops.Profile.cramersV(
      Seq(("x", "u"), ("x", "v")).toDF("a", "b"),
      col("a"), col("b"), "a", "b").collect().head
    assert(d.getAs[Long]("dof") == 0L)
    assert(d.isNullAt(d.fieldIndex("v_bp")))
  }

  test("cramersV matches a BigInt JVM recompute on a skewed 3x2 table") {
    val s2 = spark
    import s2.implicits._
    val counts = Map(("a", "u") -> 7, ("a", "v") -> 1, ("b", "u") -> 2,
      ("b", "v") -> 6, ("c", "u") -> 3) // ("c","v") is a zero cell
    val rows = counts.toSeq.flatMap { case ((a, b), k) =>
      Seq.fill(k)((a, b)) }
    val got = graft.ops.Profile.cramersV(rows.toDF("a", "b"),
      col("a"), col("b"), "a", "b").collect().head
    val n = counts.values.sum.toLong
    val as = Seq("a", "b", "c"); val bs = Seq("u", "v")
    def r(a: String) = bs.map(b => counts.getOrElse((a, b), 0)).sum.toLong
    def c(b: String) = as.map(a => counts.getOrElse((a, b), 0)).sum.toLong
    val chiMicro = (for { a <- as; b <- bs } yield {
      val d = BigInt(counts.getOrElse((a, b), 0).toLong * n - r(a) * c(b))
      (BigInt(1000000) * d * d) / (BigInt(n) * r(a) * c(b))
    }).sum
    assert(got.getAs[Long]("chi2_milli") == (chiMicro / 1000).toLong)
    val vExp = math.floor(10000.0 * math.sqrt(
      chiMicro.toDouble / (1000000.0 * n * 1))).toLong
    assert(got.getAs[Long]("v_bp") == vExp)
  }

  test("fuzzyNameMatch: shared-token blocking, edit threshold, name-domain row counts") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (1L, "red widget"), (2L, "red widget"), // dup name → n_rows 2
      (3L, "red widgit"),                     // 1 edit off
      (4L, "blue bolt"), (5L, "glue bolt"),   // 1 edit via 'bolt' block
      (6L, "red bolt"),                       // shares blocks, all >3 edits
      (7L, "green gear"))                     // no close neighbor
      .toDF("p_partkey", "p_name")
    val got = graft.ops.Dedup
      .fuzzyNameMatch(df, "p_name", "p_partkey", maxDist = 3)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // (red bolt, red widget) shares 'red' but dist 5; (blue bolt,
    // red bolt) shares 'bolt' but dist 4 — both excluded. rep ids
    // are the min idCol per name ("red widget" → 1 of {1,2})
    assert(got == Seq(
      ("blue bolt", "glue bolt", 4L, 5L, 1L, 1L, 1L, 8888L),
      ("red widget", "red widgit", 1L, 3L, 1L, 2L, 1L, 9000L)))
  }

  test("haarEnergy: period-2 series loads level 1 only; absent days are zeros") {
    val s2 = spark
    import s2.implicits._
    // $1 on days 0,2,4,6 of an 8-day span; odd days ABSENT (true 0s):
    // level-1 blocks are all [100, 0] → d=100, e=4·100²; levels 2-3
    // see balanced halves → d=0
    val orders = Seq("2024-01-01", "2024-01-03", "2024-01-05", "2024-01-07")
      .map((_, 1.0)).toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.haarEnergy(orders, 3)
      .as[(Long, Long, Long, Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 4L, Some(10000L), 100L),
      (2L, 4L, 2L, Some(0L), 0L),
      (3L, 8L, 1L, Some(0L), 0L)))
  }

  test("haarEnergy second-half sign and share arithmetic on a 2-day step") {
    val s2 = spark
    import s2.implicits._
    // day0 $1, day1 $3: level1 d = 100-300 = -200 (e 40000);
    // level2 both days in the first half → d = +400 (e 160000)
    val orders = Seq(("2024-01-01", 1.0), ("2024-01-02", 3.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.haarEnergy(orders, 2)
      .as[(Long, Long, Long, Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, Some(2000L), 200L),
      (2L, 4L, 1L, Some(8000L), 400L)))
  }

  test("crostonDemand: W=2 hand walk, intermittency gates, same-day lines merge") {
    val s2 = spark
    import s2.implicits._
    val li = Seq(
      // part 1: demand days 0/10/16/30 (two lines merge on day 0)
      (1L, "1970-01-01", 2.0), (1L, "1970-01-01", 3.0),
      (1L, "1970-01-11", 3.0), (1L, "1970-01-17", 2.0),
      (1L, "1970-01-31", 4.0),
      // part 2: only 2 demand days → under minDemands
      (2L, "1970-01-01", 1.0), (2L, "1970-01-06", 1.0)) ++
      // part 3: 10 consecutive days → 10·5 > span 31, not intermittent
      (0 until 10).map(i => (3L, f"1970-01-${i + 1}%02d", 1.0))
    val df = li.toDF("l_partkey", "l_shipdate", "l_quantity")
    val got = graft.ops.Market
      .crostonDemand(df, windowPow = 2, minDemands = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    // W=2 weights (2,1), denom 3: zw = 4·2 + 2·1 = 10,
    // xw = 14·2 + 6·1 = 34 → ẑ 3333, x̂ 11333, forecast 1000·10/34=294
    assert(got == Seq((1L, 4L, 31L, 10000L, 3500L, 3333L, 11333L,
      Some(294L))))
  }

  test("fdAudit: g3 counts minimum rows to delete; canary FD holds; nulls dropped") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), Some("c")), (Some(2L), Some("c")), (Some(3L), Some("d")),
      (None, Some("x")), (Some(4L), None)) // null on either side ignored
      .toDF("k", "v")
    val r = graft.ops.Profile.fdAudit(df, "k", "v", "t").collect().head
    // key 1 is the only violator: keep max(2,1)=2 of its 3 rows →
    // delete 1 of 6 rows total → g3 = 1666bp
    assert((r.getString(0), r.getString(1), r.getString(2)) ==
      (("t", "k", "v")))
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("violating_groups") == 1L)
    assert(r.getAs[Long]("g3_bp") == 1666L)
    assert(r.getAs[Int]("holds") == 0)
    val ok = graft.ops.Profile.fdAudit(
      Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("k", "v"), "k", "v", "t")
      .collect().head
    assert(ok.getAs[Long]("g3_bp") == 0L && ok.getAs[Int]("holds") == 1)
  }

  test("revenueRetention: expansion/contraction/churn/new hand panel incl. a dark month") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (1L, "2024-01-10", 1.0), (1L, "2024-02-05", 2.0), // expands +100c
      (2L, "2024-01-15", 3.0), (2L, "2024-02-20", 1.0), // contracts -200c
      (3L, "2024-01-20", 2.0),                          // churns in Feb
      (4L, "2024-02-25", 5.0),                          // new in Feb
      (1L, "2024-04-02", 1.0))                          // re-enters as NEW
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.revenueRetention(orders)
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      // Feb: base {1,2,3} 600c → retained 300c, ndr 5000, grr 3333
      ("2024-02", 3L, 600L, 300L, 100L, 200L, 200L, 500L,
        Some(5000L), Some(3333L)),
      // Mar: everyone from Feb goes dark → all 800c churns
      ("2024-03", 3L, 800L, 0L, 0L, 0L, 800L, 0L, Some(0L), Some(0L)),
      // Apr: no Mar base → ratios undefined; c1 re-enters as new
      ("2024-04", 0L, 0L, 0L, 0L, 0L, 0L, 100L, None, None)))
    // decomposition identity on every row: base = grr_num + contraction
    // + churned, retained = grr_num + expansion
    got.foreach { r =>
      val grrNum = r._4 - r._5
      assert(r._3 == grrNum + r._6 + r._7, s"base identity on ${r._1}")
    }
  }

  test("deseasonalizedCusum matches a BigInt JVM twin of the STL+CUSUM chain") {
    val s2 = spark
    import s2.implicits._
    val wd = 4; val sl = 2000L; val h = 3L
    val days = 0 until 28
    // quarter-dollar grid (exact under floor(v*100)) with a weekly
    // rhythm and a level shift in the back half
    val cents = days.map(i =>
      25L * (40 + (i % 7) * 8 + (if (i >= 14) 20 else 0)))
    val orders = days.map(i => (f"2024-01-${i + 1}%02d", cents(i) / 100.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention
      .deseasonalizedCusum(orders, wd, sl, h)
      .as[(String, Long, Long, Option[Long], Option[Long], Long, Long)]
      .collect().toSeq
    // twin: dyadic trend → dow means → remainder → running-min walk
    val denom = (1L << wd) - 1L
    val trend = days.map { t =>
      val lo = math.max(0, t - (wd - 1))
      ((lo to t).map(s => BigInt(cents(s)) << (wd - 1 - (t - s))).sum /
        denom).toLong
    }
    val det = days.map(t => cents(t) - trend(t))
    val dowMean = (0 until 7).map { d =>
      val xs = days.filter(_ % 7 == d).map(det)
      d -> xs.sum / xs.size // Scala / truncates toward zero, like DIV
    }.toMap
    val rem = days.map(t => det(t) - dowMean(t % 7))
    val n = days.size.toLong
    val sTot = BigInt(cents.sum)
    var cp = BigInt(0); var cn = BigInt(0)
    var minCp = BigInt(0); var minCn = BigInt(0)
    val thresh = BigInt(10000L * h) * sTot
    days.foreach { t =>
      cp += BigInt(10000L) * n * rem(t) - BigInt(sl) * sTot
      cn += BigInt(-10000L) * n * rem(t) - BigInt(sl) * sTot
      // the running min INCLUDES the current row (q212 convention)
      minCp = minCp.min(cp); minCn = minCn.min(cn)
      val cusumP = cp - minCp.min(0)
      val cusumN = cn - minCn.min(0)
      val row = got(t)
      assert(row._2 == cents(t) && row._3 == rem(t), s"day $t layers")
      assert(row._4.get ==
        math.floor(cusumP.toDouble / sTot.toDouble).toLong, s"day $t pos")
      assert(row._5.get ==
        math.floor(cusumN.toDouble / sTot.toDouble).toLong, s"day $t neg")
      assert(row._6 == (if (cusumP > thresh) 1L else 0L), s"day $t alarm")
    }
  }

  test("deseasonalizedCusum: a pure weekly rhythm barely moves it while raw CUSUM swings") {
    val s2 = spark
    import s2.implicits._
    // 8 weeks of a loud 7-day cycle, no level change at all
    val days = 0 until 56
    val orders = days.map(i =>
      (f"2024-01-01", 0.0)).zipWithIndex.map { case (_, i) =>
      (java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString,
        if (i % 7 == 6) 50.0 else 10.0)
    }.toDF("o_orderdate", "o_totalprice")
    val deseas = graft.ops.Retention
      .deseasonalizedCusum(orders, 4, 2000L, 3L)
      .select("pos_bp", "neg_bp").as[(Long, Long)].collect()
    val raw = graft.ops.Retention.cusumRevenue(orders, 2000L, 3L)
      .select("pos_bp", "neg_bp").as[(Long, Long)].collect()
    val dMax = deseas.map(r => math.max(r._1, r._2)).max
    val rMax = raw.map(r => math.max(r._1, r._2)).max
    assert(dMax < rMax,
      s"seasonal swing should dominate the raw walk: deseas $dMax vs raw $rMax")
  }

  test("newsvendorStock: implicit-zero quantile arithmetic and service-level sweep") {
    val s2 = spark
    import s2.implicits._
    // weeks 0 and 9 have demand, weeks 1-8 are dark → T=10, nz=2;
    // part 1's week-0 demand arrives as two merged lines (4+6)
    val li = Seq(
      (1L, "1970-01-01", 4.0), (1L, "1970-01-02", 6.0),
      (1L, "1970-03-05", 20.0),
      (2L, "1970-01-01", 5.0), (2L, "1970-03-05", 5.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity")
    val hi = graft.ops.Market.newsvendorStock(li, 9500L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // p95 over 10 weeks → rank 10 → 2nd smallest nonzero
    assert(hi == Seq(
      (1L, 10L, 2L, 30L, 3000L, 20L, 17000L),
      (2L, 10L, 2L, 10L, 1000L, 5L, 4000L)))
    // p50 rank 5 falls in the 8 dark weeks → quantile 0, negative
    // safety (median demand is below the mean for a spiky series)
    val med = graft.ops.Market.newsvendorStock(li, 5000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(med == Seq(
      (1L, 10L, 2L, 30L, 3000L, 0L, -3000L),
      (2L, 10L, 2L, 10L, 1000L, 0L, -1000L)))
  }

  test("joinOrderAudit: engineered skew makes System-R pick the wrong first join") {
    val s2 = spark
    import s2.implicits._
    // fact: ok=1 rare (1 row), pk=10 hot (5 rows); uniform-ndv
    // estimates can't see the skew
    val li = Seq((1L, 11L), (2L, 10L), (2L, 10L), (2L, 10L), (2L, 10L),
      (2L, 10L), (2L, 11L), (2L, 11L), (2L, 12L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
    val orders = Seq(1L).toDF("o_orderkey")
    val part = Seq(10L).toDF("p_partkey")
    val got = graft.ops.Profile.joinOrderAudit(orders, li, part)
      .as[(String, Long, Long, Option[Long], Long, Long, Int, Int)]
      .collect().toSeq
    // est_ol = 1·10/max(1,2)=5 vs true 1; est_lp = 10·1/max(3,1)=3 vs
    // true 5 → the estimator ranks part_first, the truth orders_first
    assert(got == Seq(
      ("orders_first", 5L, 1L, Some(5000L), 1L, 0L, 0, 1),
      ("part_first", 3L, 5L, Some(1666L), 1L, 0L, 1, 0)))
  }

  test("latencySlaTrend: monthly nearest-rank tail + pairwise-median slope") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (1L, "2024-01-05"), (2L, "2024-01-10"), (3L, "2024-01-15"),
      (4L, "2024-02-05"), (5L, "2024-02-10"), (6L, "2024-02-12"))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, "2024-01-06"), (2L, "2024-01-12"), (3L, "2024-01-25"),
      (4L, "2024-02-07"), (5L, "2024-02-13"), (6L, "2024-03-03"))
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.ops.AreaTopProducts.latencySlaTrend(li, orders)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    // Jan latencies {1,2,10}: p50 rank 2 → 2, p90 rank 3 → 10;
    // Feb {2,3,20}: p50 3, p90 20; one month pair → slope
    // (1000·(20−10))/1 = 10000 milli-days/month on every row
    assert(got == Seq(
      ("2024-01", 3L, 2L, 10L, Some(10000L)),
      ("2024-02", 3L, 3L, 20L, Some(10000L))))
  }

  test("separabilityAuc: orthogonal clusters read 10000bp; single class is undefined") {
    val s2 = spark
    import s2.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.ops.Similarity.separabilityAuc(emb, sampleMod = 1L)
      .collect().head
    // 2 same-label pairs at cos 10000, 4 cross pairs at cos 0
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("n_same") == 2L && r.getAs[Long]("n_diff") == 4L)
    assert(r.getAs[Long]("auc_bp") == 10000L)
    assert(r.getAs[Long]("mean_same_bp") == 10000L)
    assert(r.getAs[Long]("mean_diff_bp") == 0L)
    assert(r.getAs[Long]("margin_bp") == 10000L)
    val one = graft.ops.Similarity.separabilityAuc(
      Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0))
        .toDF("vec_id", "embedding", "label"), sampleMod = 1L)
      .collect().head
    assert(one.isNullAt(one.fieldIndex("auc_bp")))
    assert(one.isNullAt(one.fieldIndex("mean_diff_bp")))
  }

  test("postStratifiedLift: exact arithmetic with derived arms; self-consistent recombination") {
    val s2 = spark
    import s2.implicits._
    def armOf(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      if (java.lang.Long.parseLong(h, 16) % 100 < 50) "A" else "B"
    }
    val ids = (1L to 30L)
    // single stratum (all activity 0): A users spend $1, B users $3
    val rows = ids.map { u =>
      val v = if (armOf(u) == "A") 1.0 else 3.0
      (u * 10, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u,
        "purchase", v, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val nA = ids.count(armOf(_) == "A").toLong
    val nB = ids.size - nA
    val got = graft.ops.Experiment.postStratifiedLift(df, nStrata = 2)
      .collect().map(r => r.getAs[Long]("stratum") -> r).toMap
    val all = got(0L)
    assert(all.getAs[Long]("n_a") == nA && all.getAs[Long]("n_b") == nB)
    // mean milli-cents: A 100c → 100000, B 300c → 300000
    assert(all.getAs[Long]("mean_a_milli") == 100000L)
    assert(all.getAs[Long]("mean_b_milli") == 300000L)
    assert(all.getAs[Long]("diff_milli") == -200000L)
    // one fully-covered stratum → recombination equals the naive diff
    assert(all.getAs[Long]("post_strat_diff_milli") == -200000L)
    assert(all.getAs[Long]("weight_bp") == 10000L)
    // stratum rows: weights sum to 10000 less floor dust; the
    // recombination re-derives from the published rows
    val strata = got.view.filterKeys(_ > 0L).values.toSeq
    val covered = strata.filter(r =>
      r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    val ps = covered.map(r =>
      (r.getAs[Long]("n_a") + r.getAs[Long]("n_b")) *
        r.getAs[Long]("diff_milli")).sum /
      covered.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum
    assert(ps == all.getAs[Long]("post_strat_diff_milli"))
  }

  test("didEventStudy: hand panel with reference normalization and missing-arm nulls") {
    val s2 = spark
    import s2.implicits._
    val region = Seq((1, "ASIA"), (2, "AMERICA"), (3, "EUROPE"))
      .toDF("r_regionkey", "r_name")
    val nation = Seq((1, 1), (2, 2), (3, 3))
      .toDF("n_nationkey", "n_regionkey")
    val customer = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2), (5L, 3))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, "2024-01-10", 10.0), (3L, "2024-01-12", 8.0),   // rel -2
      (1L, "2024-02-10", 12.0), (3L, "2024-02-12", 9.0),   // rel -1
      (1L, "2024-03-05", 20.0), (2L, "2024-03-06", 18.0),  // rel 0
      (3L, "2024-03-07", 10.0),
      (1L, "2024-04-02", 22.0),                            // rel 1, no ctrl
      (1L, "2023-10-01", 99.0),                            // outside window
      (5L, "2024-03-08", 50.0))                            // EUROPE: excluded
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.ops.Experiment.didEventStudy(orders, customer,
      nation, region, cutoff = "2024-03-01", maxWindow = 2)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].collect().toSeq
    assert(got == Seq(
      (-2L, 1L, 1L, Some(1000L), Some(800L), Some(200L), Some(-100L)),
      (-1L, 1L, 1L, Some(1200L), Some(900L), Some(300L), Some(0L)),
      (0L, 2L, 1L, Some(1900L), Some(1000L), Some(900L), Some(600L)),
      (1L, 1L, 0L, Some(2200L), None, None, None)))
  }

  test("abcXyz: engineered catalog hits all three classes on both axes") {
    val s2 = spark
    import s2.implicits._
    def wk(i: Int) = f"1970-01-${1 + 7 * i}%02d" // weeks 0..3
    val li =
      // p1: steady 10 units every week (CV² 0 → X), 90% of revenue (A)
      (0 to 3).map(i => (1L, wk(i), 10.0, 100.0)) ++
      // p2: alternating 2/0 (CV² = 10000bp → Y), mid revenue (B)
      Seq((2L, wk(0), 2.0, 20.0), (2L, wk(2), 2.0, 20.0)) ++
      // p3: one spike week (CV² = 30000bp → Z), tail revenue (C)
      Seq((3L, wk(0), 8.0, 5.0))
    val df = li.toDF("l_partkey", "l_shipdate", "l_quantity",
      "l_extendedprice")
    val got = graft.ops.Market.abcXyz(df)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // totrev 44500c; prior-cum rule keeps the 90%-share top part in A
    assert(got == Seq(
      ("A", "X", 1L, 40000L, 8988L, 0L),
      ("B", "Y", 1L, 4000L, 898L, 10000L),
      ("C", "Z", 1L, 500L, 112L, 30000L)))
  }

  test("abcXyz ABC boundary survives Long-overflow revenue totals") {
    val s2 = spark
    import s2.implicits._
    // three parts at 1e15/5e14/5e14 cents (2e15 total → the old
    // (cum−rev)·10⁴ Long product wrapped at 9.2e14); doubles exact
    // to 2^53 so cents are exact. Expected prior-cum classes:
    // p1 prior 0 → A; p2 prior 50% → B? 0.5<0.8 → A... engineered:
    // shares 50%/25%/25%, cuts A<80% B<95%: p1 prior 0 → A,
    // p2 prior 50 → A, p3 prior 75 → A — so use 80/15/5 instead:
    // p1 prior 0 → A, p2 prior 80 → B, p3 prior 95 → C
    val li = Seq(
      (1L, "1970-01-01", 1.0, 1.6e13),  // 1.6e15 cents, 80%
      (2L, "1970-01-01", 1.0, 3.0e12),  // 3.0e14 cents, 15%
      (3L, "1970-01-01", 1.0, 1.0e12))  // 1.0e14 cents,  5%
      .toDF("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
    val got = graft.ops.Market.abcXyz(li)
      .select("abc_class", "n_parts", "revenue_cents")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 1L, 1600000000000000L),
      ("B", 1L, 300000000000000L),
      ("C", 1L, 100000000000000L)))
  }

  test("changepoint finds an engineered level shift with exact segment math") {
    val s2 = spark
    import s2.implicits._
    // $1/day for 4 days then $5/day for 4: τ=4 maximizes
    // (n·S_τ−τ·S)²/B (A=−6400, B=16 → q=2 560 000; τ=2 gives 853k)
    val orders = ((1 to 4).map(d => (f"2024-01-$d%02d", 1.0)) ++
      (5 to 8).map(d => (f"2024-01-$d%02d", 5.0)))
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.changepoint(orders)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("2024-01-04", 8L, 4L, 4L, 100L, 500L, -400L, 1600L)))
  }

  test("changepoint sees dark days as zeros on the dense spine") {
    val s2 = spark
    import s2.implicits._
    // revenue every day 1–4, then NOTHING 5–8: the halt is the shift
    val orders = (1 to 4).map(d => (f"2024-01-$d%02d", 4.0))
      .toDF("o_orderdate", "o_totalprice") union
      Seq(("2024-01-08", 0.01)).toDF("o_orderdate", "o_totalprice")
    // days 1..8 dense; cents 400×4 then 0,0,0,1
    // τ=4: A = 8·1600 − 4·1601 = 6396, B=16, q≈2 556 800 — max
    val got = graft.ops.Retention.changepoint(orders)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.head._1 == "2024-01-04")
    assert(got.head._7 == 399L) // ⌊6396/16⌋ mean-shift cents
  }

  test("gapIslands names each missing-day run with bounds and prior revenue") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      ("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-05", 3.0),
      ("2024-01-06", 4.0), ("2024-01-10", 5.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.gapIslands(orders)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-03", "2024-01-04", 2L, 200L),
      ("2024-01-07", "2024-01-09", 3L, 400L)))
    // contiguous log → no gap rows
    val dense = Seq(("2024-01-01", 1.0), ("2024-01-02", 1.0))
      .toDF("o_orderdate", "o_totalprice")
    assert(graft.ops.Retention.gapIslands(dense).count() == 0L)
  }

  test("permutationTest: add-one p, replicate budget, and an independently computed t_obs") {
    val events = graft.tables.Tables(spark, sf, "events")
    val reps = 20
    val row = graft.ops.Experiment.permutationTest(events, reps = reps)
      .collect().head
    assert(row.getAs[Long]("reps") == reps.toLong)
    val nExtreme = row.getAs[Long]("n_extreme")
    assert(nExtreme >= 0L && nExtreme <= reps.toLong)
    assert(row.getAs[Long]("p_milli") ==
      (1000L * (1L + nExtreme)) / (reps + 1L))
    // independent t_obs: same arm draw, plain aggregation, BigInt math
    val s2 = spark
    import s2.implicits._
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("m"))
      .withColumn("arm", graft.ops.Experiment.armCol("user_id", 50))
      .groupBy(col("arm")).agg(sum(col("m")).as("s"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (a, s, n) => a -> ((s, n)) }.toMap
    val (sa, na) = users("A"); val (sb, nb) = users("B")
    val num = BigInt(sa) * nb - BigInt(sb) * na
    val tExp = (num.signum: Int) *
      ((BigInt(1000000) * num.abs) / (BigInt(na) * nb))
    assert(BigInt(row.getAs[Long]("t_obs_micro")) == tExp)
  }

  test("permutationTest degenerate single-user input: p = 1000, null t") {
    val s2 = spark
    import s2.implicits._
    val events = Seq((1L, "click"), (1L, "view"))
      .toDF("user_id", "event_type")
    val row = graft.ops.Experiment.permutationTest(events, reps = 5)
      .collect().head
    // one user → one empty arm everywhere → t null, every replicate
    // ties the observed 0 magnitude → p = 1000 (never 0, never crash)
    assert(row.isNullAt(row.fieldIndex("t_obs_micro")))
    assert(row.getAs[Long]("p_milli") == 1000L)
  }

  test("permutationTest empty input: 0 rows, matching the oracle's empty GROUP BY") {
    val s2 = spark
    import s2.implicits._
    val events = Seq.empty[(Long, String)].toDF("user_id", "event_type")
    // the q335 oracle's CTE chain emits 0 rows on an empty events
    // table; a bare global agg here would emit one degenerate row —
    // the reps > 0 guard keeps the engines row-count identical
    assert(graft.ops.Experiment.permutationTest(events, reps = 5)
      .collect().isEmpty)
  }

  test("mdePower reproduces a BigInt reimplementation of the moment ladder") {
    val events = graft.tables.Tables(spark, sf, "events")
    val row = graft.ops.Experiment.mdePower(events).collect().head
    val s2 = spark
    import s2.implicits._
    val mo = events.groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", graft.ops.Experiment.armCol("user_id", 50))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
        sum(col("m") * col("m")).as("q"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (naL, saL, qaL) = mo("A"); val (nbL, sbL, qbL) = mo("B")
    def varMilli(n: Long, s: Long, q: Long): BigInt =
      (BigInt(1000) * (BigInt(n) * q - BigInt(s) * s)) /
        (BigInt(n) * (n - 1))
    val va = varMilli(naL, saL, qaL); val vb = varMilli(nbL, sbL, qbL)
    assert(BigInt(row.getAs[Long]("var_a_milli")) == va)
    assert(BigInt(row.getAs[Long]("var_b_milli")) == vb)
    val se2 = (BigInt(1000000000) * va) / naL +
      (BigInt(1000000000) * vb) / nbL
    def isqrt(x: BigInt): BigInt = {
      var y = BigInt(math.sqrt(x.toDouble).toLong)
      while (y * y > x) y -= 1
      while ((y + 1) * (y + 1) <= x) y += 1
      y
    }
    val mde = (BigInt(2802) * isqrt(se2)) / 1000
    assert(BigInt(row.getAs[Long]("mde_abs_micro")) == mde)
    val rel = (BigInt(10000) * mde * (naL + nbL)) /
      (BigInt(1000000) * (saL + sbL))
    assert(BigInt(row.getAs[Long]("mde_rel_bp")) == rel)
  }

  test("ratioDelta reproduces a BigInt reimplementation of the delta-method ladder") {
    val events = graft.tables.Tables(spark, sf, "events")
    val rows = graft.ops.Experiment.ratioDelta(events).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    val s2 = spark
    import s2.implicits._
    val mo = events.groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === "purchase",
        floor(col("value") * lit(100.0)).cast("long"))), lit(0L)).as("r"),
        count(lit(1)).as("s"))
      .withColumn("arm", graft.ops.Experiment.armCol("user_id", 50))
      .select(col("r"), col("s"), col("arm"))
      .as[(Long, Long, String)].collect()
    for (arm <- Seq("A", "B")) {
      val g = mo.filter(_._3 == arm)
      val n = g.length.toLong
      val sr = g.map(_._1).sum; val ss = g.map(_._2).sum
      val qrr = g.map(x => BigInt(x._1) * x._1).sum
      val qrs = g.map(x => BigInt(x._1) * x._2).sum
      val qss = g.map(x => BigInt(x._2) * x._2).sum
      val ratio = (BigInt(1000) * sr) / ss
      val vnum = BigInt(1000000) * (n * qrr - BigInt(sr) * sr) -
        BigInt(2000) * ratio * (n * qrs - BigInt(sr) * ss) +
        ratio * ratio * (n * qss - BigInt(ss) * ss)
      val vb = vnum.max(BigInt(0)) / (n - 1)
      def isqrt(x: BigInt): BigInt = {
        var y = BigInt(math.sqrt(x.toDouble).toLong)
        while (y * y > x) y -= 1
        while ((y + 1) * (y + 1) <= x) y += 1
        y
      }
      val se = isqrt(vb) / ss
      val row = rows(arm)
      assert(BigInt(row.getAs[Long]("ratio_milli")) == ratio,
        s"$arm ratio")
      assert(BigInt(row.getAs[Long]("se_milli")) == se, s"$arm se")
      assert(row.getAs[Long]("ci_lo_milli") ==
        row.getAs[Long]("ratio_milli") - 1960L * se.toLong / 1000L)
    }
  }

  test("sourceValueKnn: removing the signal source zeroes accuracy; the noise source costs nothing") {
    val s2 = spark
    import s2.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0f), 0),  // the probe (0 % 5 == 0), srcA
      (1L, Seq(1.0f, 0f), 0), (2L, Seq(1.0f, 0f), 0),   // srcA signal
      (3L, Seq(0f, 1.0f), 1), (4L, Seq(0f, 1.0f), 1))   // srcB noise
      .toDF("vec_id", "embedding", "label")
    val docs = Seq((0L, "srcA"), (1L, "srcA"), (2L, "srcA"),
      (3L, "srcB"), (4L, "srcB")).toDF("doc_id", "source")
    val got = graft.ops.Similarity
      .sourceValueKnn(emb, docs, k = 2, probeMod = 5L)
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      // full pool: ids 1,2 (cos 10000) outvote — correct
      ("srcA", 3L, Some(10000L), Some(0L), Some(10000L)),
      ("srcB", 2L, Some(10000L), Some(10000L), Some(0L))))
  }

  test("hubness: engineered hub pair, antihubs counted, symmetric devs zero the skew") {
    val s2 = spark
    import s2.implicits._
    // sample = ids ≡0 mod 5; ids 0 and 5 are each other's (and the
    // others') nearest at k=1; 10 and 15 never surface → antihubs
    val emb = Seq(
      (0L, Seq(1.0f, 0f), 0), (5L, Seq(1.0f, 0.1f), 0),
      (10L, Seq(1.0f, -0.1f), 0), (15L, Seq(0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.hubness(emb, k = 1, sampleMod = 5L)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    // c = {0:2 (5,10 vote it), 5:2 (0 tie→smaller id, 15), 10:0, 15:0}
    // d = 4c−4 = {4,4,−4,−4} → Σd³=0 → skew exactly 0
    assert(got == Seq((4L, 1L, 2L, 2L, 0L, Some(0L))))
  }

  test("spearmanDaily: hand midranks with an x-tie give rho 900") {
    val s2 = spark
    import s2.implicits._
    // x (orders/day) = {1,1,2}, y (cents) = {100,200,300}:
    // rx2={3,3,6}, ry2={2,4,6} → num=18, dx=18, dy=24,
    // isqrt(432)=20 → rho = ⌊1000·18/20⌋ = 900
    val orders = Seq(
      ("2024-01-01", 1.0),
      ("2024-01-02", 2.0),
      ("2024-01-03", 1.0), ("2024-01-03", 2.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.spearmanDaily(orders)
      .as[(Long, Option[Long], Long, Long)].collect().toSeq
    assert(got == Seq((3L, Some(900L), 1L, 0L)))
  }

  test("wilsonCi: x=0 lower bound is exactly 0; sf0.001 matches a BigInt ladder") {
    val s2 = spark
    import s2.implicits._
    val lone = Seq((1L, "click")).toDF("user_id", "event_type")
    val row0 = graft.ops.Experiment.wilsonCi(lone).collect().head
    assert(row0.getAs[Long]("wilson_lo_micro") == 0L)
    assert(row0.getAs[Long]("wilson_hi_micro") ==
      ((BigInt(1000000) * 7683200) / 9683200).toLong)
    val events = graft.tables.Tables(spark, sf, "events")
    val rows = graft.ops.Experiment.wilsonCi(events).collect()
    assert(rows.map(_.getAs[String]("arm")).toSeq == Seq("A", "B"))
    for (r <- rows) {
      val n = BigInt(r.getAs[Long]("n_users"))
      val x = BigInt(r.getAs[Long]("n_converted"))
      def isqrt(v: BigInt): BigInt = {
        var y = BigInt(math.sqrt(v.toDouble).toLong)
        while (y * y > v) y -= 1
        while ((y + 1) * (y + 1) <= v) y += 1
        y
      }
      val root = isqrt((BigInt(4000000) * x * (n - x)) / n + 3841600)
      val den = 2 * (BigInt(1000000) * n + 3841600)
      val lo = (BigInt(1000000) *
        (BigInt(2000000) * x + 3841600 - 1960 * root).max(0)) / den
      val hi = (BigInt(1000000) *
        (BigInt(2000000) * x + 3841600 + 1960 * root)) / den
      assert(BigInt(r.getAs[Long]("wilson_lo_micro")) == lo)
      assert(BigInt(r.getAs[Long]("wilson_hi_micro")) == hi)
      assert(lo <= (BigInt(1000000) * x) / n && (x == 0 || lo > 0))
    }
  }

  test("smdBalance matches a BigInt reimplementation of the Austin ladder") {
    val s2 = spark
    import s2.implicits._
    val docs = graft.tables.Tables(spark, sf, "documents")
    val got = graft.ops.TrainingPrep.smdBalance(docs, 9000L, 500L)
      .collect()
    assert(got.length == 6)
    // independent ladder for one row: (train, val, n_chars)
    val mo = docs.filter(col("text").isNotNull)
      .withColumn("split",
        graft.ops.TrainingPrep.splitCol(col("doc_id"), 9000L, 500L))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
        sum(col("n_chars") * col("n_chars")).as("q"))
      .collect().map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("s"), r.getAs[Long]("q"))))
      .toMap
    def varMilli(t: (Long, Long, Long)): BigInt =
      (BigInt(1000) * (BigInt(t._1) * t._3 - BigInt(t._2) * t._2)) /
        (BigInt(t._1) * (t._1 - 1))
    def meanMilli(t: (Long, Long, Long)): BigInt =
      (BigInt(1000) * t._2) / t._1
    def isqrt(v: BigInt): BigInt = {
      var y = BigInt(math.sqrt(v.toDouble).toLong)
      while (y * y > v) y -= 1
      while ((y + 1) * (y + 1) <= v) y += 1
      y
    }
    val sig = isqrt(
      (BigInt(1000) * (varMilli(mo("train")) + varMilli(mo("val")))) / 2)
    val smd = (BigInt(1000) *
      (meanMilli(mo("train")) - meanMilli(mo("val"))).abs) / sig
    val row = got.find(r => r.getAs[String]("split_a") == "train" &&
      r.getAs[String]("split_b") == "val" &&
      r.getAs[String]("feature") == "n_chars").get
    assert(BigInt(row.getAs[Long]("smd_milli")) == smd)
  }

  test("giniTrend: two-customer month pins the exact ladder") {
    val s2 = spark
    import s2.implicits._
    // cents {100, 300}: Σi·cᵢ = 700 → gini = 10⁴·(1400−1200)/800 =
    // 2500; k10 = max(1, 2 div 10) = 1 → top decile = 300/400
    val orders = Seq(
      (1L, "2024-01-05", 1.0), (2L, "2024-01-20", 3.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.ops.Profile.giniTrend(orders)
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(("2024-01", 2L, 400L, Some(2500L), Some(7500L))))
  }

  test("priceEndings: engineered endings, closed shares, uniform excess") {
    val s2 = spark
    import s2.implicits._
    val li = Seq(1.99, 5.99, 9.99, 2.00, 7.00, 3.50)
      .map(Tuple1(_)).toDF("l_extendedprice")
    val got = graft.ops.Integrity.priceEndings(li)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("99", 3L, 5000L, 100L, 4900L),
      ("00", 2L, 3333L, 100L, 3233L),
      ("50", 1L, 1666L, 100L, 1566L)))
  }

  test("entityRollup: fuzzy pair merges names, singleton survives, revenue ranks") {
    val s2 = spark
    import s2.implicits._
    val part = Seq((1L, "red widget"), (2L, "red widgit"),
      (3L, "blue bolt")).toDF("p_partkey", "p_name")
    val li = Seq((1L, 1.0), (2L, 2.0), (3L, 5.0))
      .toDF("l_partkey", "l_extendedprice")
    val got = graft.ops.Dedup.entityRollup(part, li)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (3L, 1L, 1L, 1L, 500L),   // the singleton bolt
      (1L, 2L, 2L, 2L, 300L)))  // widget+widgit merged under rep 1
  }

  test("channelRetention: first-event door, 7/14-day horizons") {
    val s2 = spark
    import s2.implicits._
    def ev(id: Long, u: Long, day: Int, t: String) =
      (id, u, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), t)
    val events = Seq(
      ev(1, 1, 1, "click"), ev(2, 1, 9, "view"),   // r7 only
      ev(3, 2, 1, "view"),                          // never returns
      ev(4, 3, 1, "click"), ev(5, 3, 16, "purchase")) // r7 + r14
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Retention.channelRetention(events)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", 2L, 2L, 1L, 10000L, 5000L),
      ("view", 1L, 0L, 0L, 0L, 0L)))
  }

  test("dsirEss matches a BigInt Kish ladder on sf0.001; uniform weights give ESS = n") {
    val docs = graft.tables.Tables(spark, sf, "documents")
    val target = docs.filter(col("source") === "src0")
    val rows = graft.ops.TrainingPrep.dsirEss(docs, target)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // independent ladder from the raw scores
    val scores = graft.ops.TrainingPrep.dsirScore(docs, target)
      .select(col("source"), col("dsir_score"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val smax = scores.map(_._2).max
    def w(s: Long): BigInt =
      if (s - smax >= -30L) BigInt(1) << (30 + s - smax).toInt else BigInt(0)
    val all = scores.map(x => w(x._2))
    val essAll = (all.sum * all.sum) / all.map(x => x * x).sum
    assert(BigInt(rows("ALL").getAs[Long]("ess_docs")) == essAll)
    assert(rows("ALL").getAs[Long]("n_docs") == scores.length.toLong)
    // per-source row reproduces the same ladder on the slice
    val s0 = scores.filter(_._1 == "src0").map(x => w(x._2))
    val ess0 = (s0.sum * s0.sum) / s0.map(x => x * x).sum
    assert(BigInt(rows("src0").getAs[Long]("ess_docs")) == ess0)
    // degenerate sanity: identical scores → ESS = n exactly
    val s2 = spark
    import s2.implicits._
    val flat = Seq((1L, "a b", "en", "s1", 3L), (2L, "a b", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fr = graft.ops.TrainingPrep.dsirEss(flat, flat)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(fr("ALL").getAs[Long]("ess_docs") == 2L)
    assert(fr("ALL").getAs[Long]("ess_share_bp") == 10000L)
  }

  test("psiDrift: identical halves zero every term; ref deciles bound the cur assignment") {
    val s2 = spark
    import s2.implicits._
    // day 0 (ref) and day 10 (cur) carry the SAME value histogram:
    // 5×$1 + 5×$2 → two value-grain bins (5, 10), all terms 0
    val orders = (
      (1 to 5).map(_ => ("1970-01-01", 1.0)) ++
      (1 to 5).map(_ => ("1970-01-01", 2.0)) ++
      (1 to 5).map(_ => ("1970-01-11", 1.0)) ++
      (1 to 5).map(_ => ("1970-01-11", 2.0))
    ).toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Profile.psiDrift(orders)
      .as[(Long, Option[Long], Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (5L, None, 100L, 5L, 5L, 500000L, 500000L, 0L),
      (10L, Some(100L), 200L, 5L, 5L, 500000L, 500000L, 0L)))
    // a cur value past the last ref edge lands in the top bin
    val shifted = orders union
      Seq(("1970-01-11", 9.0)).toDF("o_orderdate", "o_totalprice")
    val top = graft.ops.Profile.psiDrift(shifted)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cur_n"))
      .toMap
    assert(top(10L) == 6L)
  }

  test("semanticDecontamination: a paraphrase-close vector flags, an orthogonal one passes") {
    val s2 = spark
    import s2.implicits._
    // eval probe = id 0 (mod 10); id 1 sits at cos 10000 (leak),
    // id 2 orthogonal (clean); id 3 close-but-under-τ at ~0.7
    val emb = Seq(
      (0L, Seq(1.0f, 0f), 0),
      (1L, Seq(2.0f, 0f), 0),
      (2L, Seq(0f, 1.0f), 1),
      (3L, Seq(1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val docs = Seq((0L, "srcE"), (1L, "srcA"), (2L, "srcB"), (3L, "srcB"))
      .toDF("doc_id", "source")
    val got = graft.ops.Contamination
      .semanticDecontamination(emb, docs, evalMod = 10L, tauBp = 9000L)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("srcA", 1L, 1L, 10000L, Some(10000L)),
      ("srcB", 2L, 0L, 0L, Some(7071L))))
  }

  test("jamesSteinMeans matches a BigInt EB ladder; shrink pulls toward the grand mean") {
    val docs = graft.tables.Tables(spark, sf, "documents")
    val got = graft.ops.Profile.jamesSteinMeans(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s2 = spark
    import s2.implicits._
    val mo = docs.filter(col("source").isNotNull && col("n_chars").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
        sum(col("n_chars") * col("n_chars")).as("q"))
      .as[(String, Long, Long, Long)].collect()
    val k = mo.length
    val gn = mo.map(_._2).sum; val gs = mo.map(_._3).sum
    val grand = BigInt(1000) * gs / gn
    def raw(t: (String, Long, Long, Long)) = BigInt(1000) * t._3 / t._2
    def vw(t: (String, Long, Long, Long)): Option[BigInt] =
      if (t._2 > 1)
        Some((BigInt(1000000) * (BigInt(t._2) * t._4 - BigInt(t._3) * t._3)) /
          (BigInt(t._2) * (t._2 - 1)))
      else None
    val pool = mo.flatMap(t => vw(t).map(_ * (t._2 - 1))).sum /
      mo.map(t => BigInt(t._2 - 1)).sum.max(1)
    val between = mo.map(t => (raw(t) - grand) * (raw(t) - grand)).sum /
      BigInt(k - 1).max(1)
    val meanSe2 = mo.map(t => pool / t._2).sum / k
    val tau2 = (between - meanSe2).max(0)
    for (t <- mo) {
      val se2 = pool / t._2
      val b = if (se2 + tau2 > 0) BigInt(10000) * se2 / (se2 + tau2)
        else BigInt(0)
      val dev = raw(t) - grand
      val shrunk = raw(t) - dev.signum * (b * dev.abs / 10000)
      val row = got(t._1)
      assert(BigInt(row.getAs[Long]("shrink_bp")) == b, s"${t._1} B")
      assert(BigInt(row.getAs[Long]("shrunk_mean_milli")) == shrunk,
        s"${t._1} shrunk")
      // shrinkage never crosses the grand mean
      assert((shrunk - grand).signum * dev.signum >= 0, s"${t._1} cross")
    }
  }

  test("revenueDrawdown: engineered dip pins peak/trough/depth; recovery flag flips") {
    val s2 = spark
    import s2.implicits._
    // cents 300,100,100,300,300 → D(n·scale) peaks at day 1 (400),
    // troughs day 3 (−800): dd 1200/n = 240¢, never recovers
    val dip = Seq(("2024-01-01", 3.0), ("2024-01-02", 1.0),
      ("2024-01-03", 1.0), ("2024-01-04", 3.0), ("2024-01-05", 3.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.ops.Retention.revenueDrawdown(dip)
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(("2024-01-01", "2024-01-03", 240L, 2L, 0)))
    // 300,100,500: the walk returns to its peak level → recovered 1
    val rec = Seq(("2024-01-01", 3.0), ("2024-01-02", 1.0),
      ("2024-01-03", 5.0)).toDF("o_orderdate", "o_totalprice")
    val got2 = graft.ops.Retention.revenueDrawdown(rec)
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(got2 == Seq(("2024-01-01", "2024-01-02", 200L, 1L, 1)))
  }

  test("sourceTransferMatrix: disjoint-vocabulary sources cost the add-1 fallback") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "a b a b", "en", "srcA", 7L),
      (2L, "x y x y", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.TextAnalysis.sourceTransferMatrix(docs)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // self-fit: every bigram seen → ⌊log2((c1+2)/(c2+1))⌋ = 0 bits;
    // cross: unseen context costs ⌊log2((0+V)/(0+1))⌋ = 1 bit at V=2
    assert(got == Seq(
      ("srcA", "srcA", 3L, 0L, 0L, 0L),
      ("srcA", "srcB", 3L, 1000L, 0L, 1000L),
      ("srcB", "srcA", 3L, 1000L, 0L, 1000L),
      ("srcB", "srcB", 3L, 0L, 0L, 0L)))
  }

  test("silhouette: identical-point clusters read 1000 milli; b>=a by construction") {
    val s2 = spark
    import s2.implicits._
    // ids 2,4 → init cluster 0 (x-axis pair); ids 1,3 → cluster 1
    // (y-axis pair): the init is already the honest clustering, every
    // point sits ON its centroid → s = 1 everywhere
    val emb = Seq(
      (1L, Array(0.0f, 1.0f), 0), (3L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 0.0f), 1), (4L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ops.KMeans.silhouette(emb, k = 2, iters = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (-1L, 4L, 1000L, 0L), (0L, 2L, 1000L, 0L), (1L, 2L, 1000L, 0L)))
    // structural: against the SAME round's centroids the own distance
    // is the argmin, so negatives are impossible
    val real = graft.ops.KMeans.silhouette(
      (1L to 40L).map(i =>
        (i, Array((i % 7).toFloat, (i % 3).toFloat), 0))
        .toDF("vec_id", "embedding", "label"), k = 4, iters = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(real.forall(_._4 == 0L), "b < a should be impossible")
    assert(real.forall(r => r._3 >= -1000L && r._3 <= 1000L))
  }

  test("propsKeyDrift: new/dropped verdicts; invalid JSON stays in the denominator") {
    val s2 = spark
    import s2.implicits._
    def ev(id: Long, t: String, props: String) =
      (id, java.sql.Timestamp.valueOf(t), 1L, "click", 1.0, props)
    val df = Seq(
      ev(1, "2024-01-10 00:00:00", """{"a": 1, "b": 2}"""),
      ev(2, "2024-01-11 00:00:00", """{"a": 3}"""),
      ev(3, "2024-01-12 00:00:00", "notjson"), // counts in ref total only
      ev(4, "2024-01-20 00:00:00", """{"a": 1, "c": 9}"""),
      ev(5, "2024-01-21 00:00:00", """{"c": 4}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.Profile.propsKeyDrift(df, "2024-01-16")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long],
        String)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 1L, Some(6666L), Some(5000L), Some(-1666L), "present"),
      ("b", 1L, 0L, Some(3333L), Some(0L), Some(-3333L), "dropped"),
      ("c", 0L, 2L, Some(0L), Some(10000L), Some(10000L), "new")))
  }

  test("revenueCohortTriangle: whole-cohort per-capita, age-0 benchmark, age clipping") {
    val s2 = spark
    import s2.implicits._
    val orders = Seq(
      (1L, "2024-01-10", 2.0), (1L, "2024-02-05", 1.0), // cohort Jan
      (2L, "2024-01-15", 4.0), (2L, "2024-04-02", 9.0), // age 3: clipped
      (3L, "2024-02-20", 3.0), (3L, "2024-04-21", 3.0)) // cohort Feb
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.ops.Retention
      .revenueCohortTriangle(orders, maxAgeMonths = 2)
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      // Jan cohort (2 users): age 0 600c → 300000 milli pc; age 1 only
      // c1 active but the DENOMINATOR stays 2 (inactives dilute)
      ("2024-01", 0L, 2L, 2L, 600L, 300000L, Some(10000L)),
      ("2024-01", 1L, 2L, 1L, 100L, 50000L, Some(1666L)),
      ("2024-02", 0L, 1L, 1L, 300L, 300000L, Some(10000L)),
      ("2024-02", 2L, 1L, 1L, 300L, 300000L, Some(10000L))))
  }

  test("kaplanMeier: hand-unrolled product ladder with right-censoring") {
    val s2 = spark
    import s2.implicits._
    def e(id: Long, u: Long, day: Int) =
      (id, u, Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"), "view")
    // lifetimes: u1=2 (event), u2=4 (event), u3=9 but last day = the
    // corpus max day 10 → CENSORED, u4=0 (event), u5=10 censored
    val events = Seq(
      e(1, 1, 0), e(2, 1, 2),
      e(3, 2, 0), e(4, 2, 4),
      e(5, 3, 1), e(6, 3, 10),
      e(7, 4, 3),
      e(8, 5, 0), e(9, 5, 10)
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Retention.kaplanMeier(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // S steps only at event times, per-step floor:
    // t=0: 5 at risk, 1 event → 800000; t=2: 4 → 600000; t=4: 3 →
    // 400000; the two censored lifetimes never cut survival
    assert(got == Seq(
      (0L, 5L, 1L, 0L, 800000L),
      (2L, 4L, 1L, 0L, 600000L),
      (4L, 3L, 1L, 0L, 400000L)))
  }

  test("audienceUnionChecked: inclusion-exclusion per type pair; sketch verdict holds") {
    val s2 = spark
    import s2.implicits._
    val events = Seq(
      (1L, "click"), (2L, "click"), (3L, "click"),
      (2L, "purchase"), (3L, "purchase"), (4L, "purchase"),
      (1L, "view"))
      .toDF("user_id", "event_type")
    val got = graft.ops.Market.audienceUnionChecked(events)
      .as[(String, String, Long, Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("click", "purchase", 3L, 3L, 4L, 2L, 1),
      ("click", "view", 3L, 1L, 3L, 1L, 1),
      ("purchase", "view", 3L, 1L, 4L, 0L, 1)))
  }

  test("goodTuring: freq-of-freqs, Turing r*, and the N1/N unseen row") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "a a b c"), (2L, "b d"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.goodTuring(docs)
      .as[(Long, Option[Long], Long, Option[Long])].collect().toSeq
    // a:2 b:2 c:1 d:1 → N=6, N1=2, N2=2
    assert(got == Seq(
      (0L, None, 333333L, None),                  // unseen = N1/N
      (1L, Some(2L), 333333L, Some(2000L)),       // r*=2·N2/N1=2.000
      (2L, Some(2L), 666666L, None)))             // no N3 → null r*
  }

  test("quantileTreatment: JVM twin of the per-arm nearest-rank picks") {
    val s2 = spark
    import s2.implicits._
    val events = graft.tables.Tables(spark, sf, "events")
    val got = graft.ops.Experiment.quantileTreatment(events)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // independent twin: per-user counts, md5 arm, sort, ceil-rank pick
    val users = events.groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      .withColumn("arm", graft.ops.Experiment.armCol("user_id", 50))
      .as[(Long, Long, String)].collect()
    def q(arm: String, pBp: Long): Long = {
      val ms = users.filter(_._3 == arm).sortBy(u => (u._2, u._1)).map(_._2)
      ms((((pBp * ms.length + 9999) / 10000) - 1).toInt)
    }
    val expect = Seq(2500L, 5000L, 7500L, 9000L)
      .map(p => (p, q("A", p), q("B", p), q("B", p) - q("A", p)))
    assert(got == expect)
  }

  test("fdrScreen: per-type p matches permutationTest; BH step-up twin") {
    val s2 = spark
    import s2.implicits._
    val events = graft.tables.Tables(spark, sf, "events")
    val reps = 20 // small replicate budget: this pins plumbing, not power
    val got = graft.ops.Experiment.fdrScreen(events, reps = reps)
      .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
    // (a) each family member's p equals the standalone permutation
    // test on that type's events (same population, same md5 draws)
    got.foreach { case (t, _, p, _, _, _) =>
      val solo = graft.ops.Experiment
        .permutationTest(events.filter(col("event_type") === t), reps = reps)
        .select(col("p_milli")).as[Long].collect().head
      assert(solo == p, s"family p for $t diverged from the solo test")
    }
    // (b) the BH step-up reimplemented over the returned p values
    val m = got.size
    val sorted = got.sortBy(r => (r._3, r._1))
    val iStar = sorted.zipWithIndex
      .filter { case (r, i) => r._3 * m <= 50L * (i + 1) }
      .map(_._2 + 1).lastOption.getOrElse(0)
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r._4 == i + 1L)
      assert((r._6 == 1) == (i + 1 <= iStar), s"reject flag wrong at rank ${i + 1}")
    }
  }

  test("mannKendall: monotone series rejects, flat series zeroes S and Var") {
    val s2 = spark
    import s2.implicits._
    graft.ops.Shared.invalidate(spark)
    def orders(cents: Seq[Long]) = cents.zipWithIndex.map { case (c, i) =>
      (java.time.LocalDate.ofEpochDay(19700L + i).toString, c / 100.0)
    }.toDF("o_orderdate", "o_totalprice")
    // strictly increasing 5 days: S = C(5,2) = 10, no ties →
    // var18 = 5·4·15 = 300; zs = 180000·(10−1)² = 14 580 000
    // > 38416·300 = 11 524 800 → reject (z = 9/√16.67 = 2.20)
    val up = graft.ops.Retention.mannKendall(
      orders(Seq(10000L, 20000L, 30000L, 40000L, 50000L)))
      .as[(Long, Long, Long, Long, Int)].collect().head
    assert(up == ((5L, 10L, 300L, 14580000L, 1)))
    graft.ops.Shared.invalidate(spark)
    // flat series: S = 0; the single 5-tie group cancels Var exactly
    val flat = graft.ops.Retention.mannKendall(
      orders(Seq(10000L, 10000L, 10000L, 10000L, 10000L)))
      .as[(Long, Long, Long, Long, Int)].collect().head
    assert(flat == ((5L, 0L, 0L, 0L, 0)))
    graft.ops.Shared.invalidate(spark)
  }

  test("fuzzyNameMatch blockCap deterministically bounds each token block") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "red widget"), (2L, "red widgit"), (3L, "red bolt"))
      .toDF("p_partkey", "p_name")
    // cap 1: every block keeps only its lexicographically-smallest
    // name → no block holds two names → no pairs at all
    val capped = graft.ops.Dedup
      .fuzzyNameMatch(df, "p_name", "p_partkey", maxDist = 3, blockCap = 1)
    assert(capped.count() == 0L)
    val uncapped = graft.ops.Dedup
      .fuzzyNameMatch(df, "p_name", "p_partkey", maxDist = 3)
    assert(uncapped.count() == 1L) // (red widget, red widgit)
  }
}
