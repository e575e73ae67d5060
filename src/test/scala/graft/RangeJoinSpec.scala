package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1767225600000L
  private def ts(offsetS: Long) = new Timestamp(T0 + offsetS * 1000)

  private def events(rows: (Long, String, Double, Long)*) =
    rows.toSeq.map { case (id, et, v, t) => (1L, id, et, v, ts(t)) }
      .toDF("user_id", "event_id", "event_type", "value", "ts")

  test("purchasesBeforeClicks: window is [ts-w, ts) across ALL users") {
    val out = RangeJoin.purchasesBeforeClicks(events(
      (1L, "purchase", 1.0, 0L),      // 3600s before click 10 -> excluded (= lower bound is inclusive: 3600-3600=0 ✓ kept)
      (2L, "purchase", 2.0, 3599L),   // inside
      (3L, "purchase", 4.0, 3600L),   // at click ts -> excluded (strict <)
      (10L, "click", 0.0, 3600L),
      (11L, "click", 0.0, 10000L)     // empty window
    ), windowSecs = 3600L)
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(out(10L) == ((2L, 300L)))  // purchases at 0 and 3599 (100 + 200 cents)
    assert(out(11L) == ((0L, 0L)))
  }

  test("pairs agree with a brute-force range join on random data") {
    val rnd = new scala.util.Random(11)
    val evs = events((1L to 200L).map { i =>
      val et = if (rnd.nextBoolean()) "click" else "purchase"
      (i, et, rnd.nextInt(100) / 10.0, rnd.nextInt(20000).toLong)
    }: _*)
    val got = RangeJoin.purchasesBeforeClicks(evs, windowSecs = 1800L)
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    val rows = evs.select(col("event_id"), col("event_type"), col("value"),
      unix_micros(col("ts"))).as[(Long, String, Double, Long)].collect()
    val purchases = rows.filter(_._2 == "purchase")
    val want = rows.filter(_._2 == "click").map { case (id, _, _, us) =>
      val in = purchases.filter(p => p._4 >= us - 1800000000L && p._4 < us)
      id -> ((in.length.toLong, in.map(p => math.floor(p._3 * 100).toLong).sum))
    }.toMap
    assert(got == want)
  }
}
