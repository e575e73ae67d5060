package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.SketchStream

/** Streaming rolling-distinct monitor: estimate parity with a direct
  * datasketches twin (same lgK, same long-keyed updates Spark's
  * hll_sketch_agg performs), cross-batch cumulative day sketches,
  * and the free replay idempotence of absolute sketch state. */
class SketchStreamSpec extends SparkSpec {

  private val LgK = 12
  private val Windows = Seq(2, 3)

  private def click(u: Long, day: String, hour: Int = 10) =
    SketchStream.Click(u, Timestamp.valueOf(f"$day $hour%02d:00:00"))

  /** JVM twin: per-day sketches over everything fed so far, rolled
    * up with the same trailing-window unions the machine publishes. */
  private def twin(fed: Seq[SketchStream.Click])
      : (Map[String, Long], Map[(String, String), Long]) = {
    val byDay = fed.groupBy(_.ts.toLocalDateTime.toLocalDate)
    val sks = byDay.map { case (d, cs) =>
      val sk = new HllSketch(LgK, TgtHllType.HLL_8)
      cs.foreach(c => sk.update(c.user_id))
      d -> sk
    }
    val days = sks.keys.toSeq.sorted
    val dau = days.map(d => d.toString -> Math.round(sks(d).getEstimate)).toMap
    val wau = (for {
      d <- days
      w <- Windows
    } yield {
      val u = new Union(LgK)
      days.filter(x => !x.isAfter(d) && x.isAfter(d.minusDays(w)))
        .foreach(x => u.update(sks(x)))
      (w.toString, d.toString) ->
        Math.round(u.getResult(TgtHllType.HLL_8).getEstimate)
    }).toMap
    (dau, wau)
  }

  private def storeDau(st: InMemoryStore): Map[String, Long] =
    st.scan("sk_dau").map { case (k, v) => k.head -> v }.toMap

  private def storeWau(st: InMemoryStore): Map[(String, String), Long] =
    st.scan("sk_wau").map { case (k, v) => (k.head, k(1)) -> v }.toMap

  test("streamed rolling distinct equals the datasketches twin; late user folds into its day") {
    val s = spark
    import s.implicits._
    val name = "sketch-test"
    InMemoryStore.clear(name)
    SketchStream.SketchLedger.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SketchStream.Click]
    // 3-day watermark: the late-user feed below lands a day-1 row
    // AFTER day-3 rows exist; a day-grain aggregate drops late rows
    // whose window END trails the watermark, so the horizon must
    // cover the full lateness we exercise
    val q = SketchStream.sketchQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-sketch").toString, name, Windows, LgK,
      delay = "3 days")
    val fed = scala.collection.mutable.ArrayBuffer.empty[SketchStream.Click]
    def feed(cs: SketchStream.Click*): Unit = {
      fed ++= cs; mem.addData(cs: _*); q.processAllAvailable()
    }
    try {
      feed(click(1, "2024-01-01"), click(2, "2024-01-01"),
        click(1, "2024-01-02"))
      val st = new InMemoryStore(name)
      val (d1, w1) = twin(fed.toSeq)
      assert(storeDau(st) == d1)
      assert(storeWau(st) == w1)
      // tiny cardinalities: HLL is exact here, so pin the values too
      assert(w1(("2", "2024-01-02")) == 2L)
      // a LATE user for day 1 (inside the watermark) grows that day's
      // cumulative sketch AND the windows that cover it
      feed(click(3, "2024-01-01", hour = 11), click(3, "2024-01-03"))
      val (d2, w2) = twin(fed.toSeq)
      assert(storeDau(st) == d2)
      assert(storeWau(st) == w2)
      assert(d2("2024-01-01") == 3L)
      // 3-day window at d3 sees all of u1..u3; 2-day window ages u2 out
      assert(w2(("3", "2024-01-03")) == 3L)
      assert(w2(("2", "2024-01-03")) == 2L)
    } finally q.stop()
  }

  test("replaying a batch of absolute sketches is a no-op (no ledger, no marker needed)") {
    val s = spark
    import s.implicits._
    val name = "sketch-replay"
    InMemoryStore.clear(name)
    SketchStream.SketchLedger.clear(name)
    val batch = Seq(
      ("2024-01-01", daySketchBytes(Seq(1L, 2L))),
      ("2024-01-02", daySketchBytes(Seq(2L, 3L)))
    ).toDF("day", "sk")
    SketchStream.sketchBatch(name, InMemoryProvider(name), Windows, LgK)(
      batch, 0L)
    val st = new InMemoryStore(name)
    val first = (storeDau(st), storeWau(st))
    // crash-replay: the exact same batch applies again
    SketchStream.sketchBatch(name, InMemoryProvider(name), Windows, LgK)(
      batch, 0L)
    assert((storeDau(st), storeWau(st)) == first)
    assert(first._1 == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L))
    assert(first._2(("2", "2024-01-02")) == 3L)
  }

  private def daySketchBytes(users: Seq[Long]): Array[Byte] = {
    val sk = new HllSketch(LgK, TgtHllType.HLL_8)
    users.foreach(sk.update)
    sk.toUpdatableByteArray
  }
}
