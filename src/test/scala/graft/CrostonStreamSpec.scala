package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.CrostonStream
import graft.streaming.CrostonStream.{Demand, Forecast, Ring}

/** Streaming Croston: exact parity with the q318 batch kernel across
  * batch splits (incl. same-day lines split across batches and an
  * in-ring out-of-order day), straggler skip, ring trimming, and the
  * state-transition unit walk. */
class CrostonStreamSpec extends SparkSpec {

  private val W = 2

  private def batchRows(rows: Seq[(Long, String, Double)])
      : Map[Long, (Long, Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    // wide-span fixture keeps every part inside the intermittency gate
    graft.ops.Market.crostonDemand(
      rows.toDF("l_partkey", "l_shipdate", "l_quantity"),
      windowPow = W, minDemands = 2)
      .collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("z_hat_milli"), r.getAs[Long]("x_hat_milli"),
          Option(r.getAs[java.lang.Long]("croston_milli"))
            .map(_.longValue))))
      .toMap
  }

  test("latest streamed forecasts equal the batch op across batch splits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = CrostonStream.forecasts(
      mem.toDF().toDF("l_partkey", "l_shipdate", "l_quantity"),
      windowPow = W)
      .writeStream.format("memory").queryName("croston_out")
      .outputMode("append").start()
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    def feed(ds: (Long, String, Double)*): Seq[Forecast] = {
      val before = s.table("croston_out").count()
      fed ++= ds
      mem.addData(ds.map { case (p, d, u) => (p, ts(d), u) }: _*)
      q.processAllAvailable()
      s.table("croston_out").as[Forecast].collect().toSeq
        .drop(before.toInt)
    }
    try {
      // batch 1: day 0 gets only PART of its units (4 of 10)
      feed((1L, "1970-01-01", 4.0), (1L, "1970-01-11", 3.0))
      // batch 2: the rest of day 0 folds in; two more demand days
      val out2 = feed((1L, "1970-01-01", 6.0), (1L, "1970-01-17", 2.0),
        (1L, "1970-01-31", 4.0))
      val f1 = out2.filter(_.partkey == 1L).last
      val b = batchRows(fed.toSeq)(1L)
      val denom = (1L << W) - 1L
      assert((1000L * f1.zw / denom, 1000L * f1.xw / denom,
        f1.croston_milli) == b, s"stream $f1 vs batch $b")
      // an in-ring out-of-order NEW day folds exactly too
      val out3 = feed((1L, "1970-01-25", 5.0))
      val f2 = out3.filter(_.partkey == 1L).last
      val b2 = batchRows(fed.toSeq)(1L)
      assert((1000L * f2.zw / denom, 1000L * f2.xw / denom,
        f2.croston_milli) == b2, s"stream $f2 vs batch $b2")
    } finally q.stop()
  }

  test("updatePart: ring trim at W+1, same-day fold, straggler skip, first-day no-gap") {
    val st = new TestGroupState[Ring]
    // W=2 → ring keeps 3 days; feed 4 days, oldest must drop
    val out1 = CrostonStream.updatePart(W)(7L, Iterator(
      Demand(7L, 0L, 10L), Demand(7L, 10L, 3L),
      Demand(7L, 16L, 2L), Demand(7L, 30L, 4L)), st).toSeq
    assert(st.value.get.days == Seq(10L, 16L, 30L))
    assert(st.value.get.n == 4L)
    // zw: last 2 occurrences (16:2, 30:4) → 4·2 + 2·1 = 10;
    // xw: gaps 14·2 + 6·1 = 34; forecast 1000·10/34 = 294
    assert(out1 == Seq(Forecast(7L, 4L, 10L, 34L, Some(294L))))
    // same-day fold onto the LAST day changes zw only:
    // day 30 now holds 10 units → zw = 10·2 + 2·1 = 22
    val out2 = CrostonStream.updatePart(W)(7L,
      Iterator(Demand(7L, 30L, 6L)), st).toSeq
    assert(out2.head.zw == 22L && out2.head.xw == 34L)
    // straggler older than the ring is skipped (state unchanged)
    val out3 = CrostonStream.updatePart(W)(7L,
      Iterator(Demand(7L, 3L, 99L)), st).toSeq
    assert(out3.head == out2.head && st.value.get.days == Seq(10L, 16L, 30L))
    // a fresh part's first day has no gap → xw 0, forecast undefined
    val st2 = new TestGroupState[Ring]
    val out4 = CrostonStream.updatePart(W)(8L,
      Iterator(Demand(8L, 5L, 2L)), st2).toSeq
    assert(out4 == Seq(Forecast(8L, 1L, 4L, 0L, None)))
  }
}
