package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def probe(rows: (Long, Long, Long)*) = // (key, id, ts-sec)
    rows.toSeq.map { case (k, id, t) => (k, id, ts(t)) }
      .toDF("k", "probe_id", "ts")

  private def build(rows: (Long, Long, Long, Double)*) = // (key, id, ts-sec, v)
    rows.toSeq.map { case (k, id, t, v) => (k, ts(t), id, v) }
      .toDF("k", "ts", "event_id", "value")

  private def asof(p: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame) =
    AsOfJoin.leftAsOf(p, b, Seq("k"), "ts", Seq("event_id"))
      .select(col("k"), col("probe_id"), col("asof_event_id"))
      .as[(Long, Long, Option[Long])].collect()
      .map { case (k, id, m) => (k, id) -> m }.toMap

  test("leftAsOf picks the latest build row at or before the probe ts") {
    val got = asof(
      probe((1L, 10L, 100L), (1L, 11L, 250L), (1L, 12L, 50L)),
      build((1L, 1L, 90L, 1.0), (1L, 2L, 200L, 2.0), (1L, 3L, 300L, 3.0)))
    assert(got == Map(
      (1L, 10L) -> Some(1L),   // 90 <= 100 < 200
      (1L, 11L) -> Some(2L),   // 200 <= 250 < 300
      (1L, 12L) -> None))      // nothing at or before 50
  }

  test("equal probe/build ts matches inclusively; build ts ties go to max id") {
    val got = asof(
      probe((1L, 10L, 100L)),
      build((1L, 7L, 100L, 1.0), (1L, 9L, 100L, 2.0), (1L, 8L, 40L, 3.0)))
    assert(got == Map((1L, 10L) -> Some(9L)))
  }

  test("keys never cross-match; all matched columns come from one row") {
    val out = AsOfJoin.leftAsOf(
      probe((1L, 10L, 100L), (2L, 20L, 100L)),
      build((1L, 1L, 90L, 1.5), (2L, 2L, 80L, 2.5)),
      Seq("k"), "ts", Seq("event_id"))
    val rows = out.select(col("k"), col("asof_event_id"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(rows == Set((1L, Some(1L), Some(1.5)), (2L, Some(2L), Some(2.5))))
  }

  test("leftAsOf agrees with a brute-force range join on random data") {
    val rnd = new scala.util.Random(7)
    val p = probe(Seq.fill(120)((rnd.nextInt(5).toLong,
      rnd.nextLong(1000000).abs, rnd.nextInt(500).toLong)): _*)
    val b = build(Seq.fill(80)((rnd.nextInt(5).toLong,
      rnd.nextLong(1000000).abs, rnd.nextInt(500).toLong, 1.0)): _*)
    val got = asof(p, b)
    // brute force: max (ts, event_id) among build rows with ts <= probe ts
    val bRows = b.select(col("k"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)].collect()
    val want = p.select(col("k"), col("probe_id"), col("ts"))
      .as[(Long, Long, Timestamp)].collect().map { case (k, id, t) =>
        val cand = bRows.filter(r => r._1 == k && !r._2.after(t))
        (k, id) -> (if (cand.isEmpty) None
                    else Some(cand.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap
    assert(got == want)
  }

  test("clickRecentPurchase applies the tolerance as an inner filter") {
    val events = Seq(
      (1L, 1L, "purchase", 2.5, ts(100L)),
      (1L, 2L, "click", 0.0, ts(200L)),   // gap 100s -> kept at tol 150
      (1L, 3L, "click", 0.0, ts(400L)),   // gap 300s -> dropped
      (2L, 4L, "click", 0.0, ts(50L))     // no purchase -> dropped
    ).toDF("user_id", "event_id", "event_type", "value", "ts")
    val out = AsOfJoin.clickRecentPurchase(events, toleranceSecs = 150L)
      .select(col("click_event_id"), col("purchase_event_id"),
        col("purchase_cents"), col("secs_since_purchase"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L, 250L, 100L)))
  }
}
