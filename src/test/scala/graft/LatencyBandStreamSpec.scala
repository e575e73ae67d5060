package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.LatencyBandStream

/** Streaming latency monitor: the consumer panel reproduces the q325
  * batch columns (monthly nearest-rank p50/p90 + Theil–Sen p90
  * slope) across batch splits; absolute puts make replay a no-op. */
class LatencyBandStreamSpec extends SparkSpec {

  private def cellsOf(st: InMemoryStore): Map[(Long, Long), Long] =
    st.scan(LatencyBandStream.Table).map { case (k, v) =>
      (k.head.toLong, k(1).toLong) -> v
    }.toMap

  private def monthStr(m: Long): String =
    f"${m / 12}%04d-${m % 12 + 1}%02d"

  private def batchPanel(rows: Seq[(String, String)])
      : (Map[String, (Long, Long, Long)], Option[Long]) = {
    val s = spark
    import s.implicits._
    val orders = rows.zipWithIndex
      .map { case ((od, _), i) => (i.toLong, od) }
      .toDF("o_orderkey", "o_orderdate")
    val li = rows.zipWithIndex
      .map { case ((_, sd), i) => (i.toLong, sd) }
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.ops.AreaTopProducts.latencySlaTrend(li, orders)
      .collect()
    val panel = got.map(r => r.getAs[String]("month") ->
      ((r.getAs[Long]("n_lines"), r.getAs[Long]("p50_days"),
        r.getAs[Long]("p90_days")))).toMap
    val slope = got.headOption.flatMap(r =>
      Option(r.getAs[java.lang.Long]("slope_milli_per_month"))
        .map(_.longValue))
    (panel, slope)
  }

  test("streamed latency cells reproduce the q325 panel and slope across batch splits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(String, String)]
    val name = "lat-test"
    InMemoryStore.clear(name)
    val q = LatencyBandStream.latencyQuery(
      mem.toDF().toDF("o_orderdate", "l_shipdate"),
      InMemoryProvider(name),
      Files.createTempDirectory("graft-lat").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def feed(ds: (String, String)*): Unit = {
      fed ++= ds; mem.addData(ds: _*); q.processAllAvailable()
    }
    def streamPanel() = {
      val (rows, slope) = LatencyBandStream.panel(
        cellsOf(new InMemoryStore(name)))
      (rows.map { case (m, v) => monthStr(m) -> v }, slope)
    }
    try {
      feed(("2024-01-05", "2024-01-06"), ("2024-01-10", "2024-01-12"),
        ("2024-01-15", "2024-01-25"))
      assert(streamPanel() == batchPanel(fed.toSeq), "after batch 1")
      // second month lands in its own batch → slope appears
      feed(("2024-02-05", "2024-02-07"), ("2024-02-10", "2024-02-13"),
        ("2024-02-12", "2024-03-03"))
      assert(streamPanel() == batchPanel(fed.toSeq), "after batch 2")
      assert(streamPanel()._2.contains(10000L), "Jan p90 10 → Feb p90 20")
      // late line folds into an OLD month's histogram exactly
      feed(("2024-01-20", "2024-01-21"))
      assert(streamPanel() == batchPanel(fed.toSeq), "after late fold")
    } finally q.stop()
  }

  test("replaying a batch's cell writes is a no-op (absolute puts)") {
    val s = spark
    import s.implicits._
    val name = "lat-replay"
    InMemoryStore.clear(name)
    val batch = Seq((648L, 3L, 7L), (649L, 10L, 2L)).toDF("m", "lat", "c")
    LatencyBandStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    LatencyBandStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    assert(cellsOf(new InMemoryStore(name)) ==
      Map((648L, 3L) -> 7L, (649L, 10L) -> 2L))
  }
}
