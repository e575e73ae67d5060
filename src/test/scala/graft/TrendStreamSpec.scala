package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.TrendStream

/** Streaming trending tokens: cross-batch running counts, touched-
  * window-only re-rank, replay idempotence. */
class TrendStreamSpec extends SparkSpec {

  // 2026-01-01 00:00:00 UTC
  private val T0 = 1767225600000L

  private def doc(id: Long, text: String, offsetMs: Long) =
    TrendStream.Doc(id, text, new Timestamp(T0 + offsetMs))

  test("running window counts accumulate across batches; top-k re-ranks") {
    val s = spark
    import s.implicits._
    val store = "trend-test"
    InMemoryStore.clear(store)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[TrendStream.Doc]
    val q = TrendStream.trendingQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-trend").toString, k = 2)
    try {
      // batch 1: minute 0 — "b" leads, minute 1 — only "z"
      mem.addData(
        doc(1, "a b b", 0), doc(2, "b c", 1000), doc(3, "z", 60000))
      q.processAllAvailable()
      val st = new InMemoryStore(store)
      val w0 = "202601010000"; val w1 = "202601010001"
      assert(st.scan("token_window_count").toMap ==
        Map(List(w0, "a") -> 1L, List(w0, "b") -> 3L, List(w0, "c") -> 1L,
          List(w1, "z") -> 1L))
      assert(st.scanPrefix("token_trend", Seq(w0)).toMap ==
        Map(List(w0, "b") -> 3L, List(w0, "a") -> 1L)) // tie a<c broken lex
      // batch 2: minute 0 gets more "c" — c overtakes a in the top-2;
      // minute 1 untouched and must keep its rank rows as-is
      mem.addData(doc(4, "c c c", 2000))
      q.processAllAvailable()
      assert(st.scanPrefix("token_trend", Seq(w0)).toMap ==
        Map(List(w0, "c") -> 4L, List(w0, "b") -> 3L))
      assert(st.scanPrefix("token_trend", Seq(w1)).toMap ==
        Map(List(w1, "z") -> 1L))
    } finally q.stop()
  }

  test("trendBatch replay is a no-op (all writes absolute)") {
    val s = spark
    import s.implicits._
    val store = "trend-replay"
    InMemoryStore.clear(store)
    val batch = Seq(("202601010000", "x", 5L), ("202601010000", "y", 2L))
      .toDF("window_key", "token", "token_count")
    TrendStream.trendBatch(InMemoryProvider(store), k = 1)(batch, 0L)
    val st = new InMemoryStore(store)
    val once = (st.scan("token_window_count").toMap, st.scan("token_trend").toMap)
    TrendStream.trendBatch(InMemoryProvider(store), k = 1)(batch, 0L)
    assert((st.scan("token_window_count").toMap, st.scan("token_trend").toMap) == once)
    assert(once._2 == Map(List("202601010000", "x") -> 5L))
  }
}
