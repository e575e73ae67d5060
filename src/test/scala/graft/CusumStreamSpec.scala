package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.CusumStream

/** Streaming CUSUM monitor: cross-batch absolute day state, exact
  * parity with Page's recursion, late-data walk reshaping, replay
  * idempotence. */
class CusumStreamSpec extends SparkSpec {

  private def ord(id: Long, price: Double, date: String) =
    CusumStream.Ord(id, price, Timestamp.valueOf(s"$date 12:00:00"))

  /** JVM reference: Page's recursion over a (day → cents) map. */
  private def walk(days: Seq[(String, Long)], target: Long, slackBp: Long,
      h: Long): Map[String, (Long, Long, Long)] = {
    var sp = 0L; var sn = 0L
    days.sortBy(_._1).map { case (d, c) =>
      sp = math.max(0L, sp + (10000L * c - (10000L + slackBp) * target))
      sn = math.max(0L, sn + ((10000L - slackBp) * target - 10000L * c))
      val a = (if (sp > 10000L * h * target) 1L else 0L) |
        (if (sn > 10000L * h * target) 2L else 0L)
      d -> ((sp / target, sn / target, a))
    }.toMap
  }

  test("streamed cusum equals the JVM recursion; a late day RESHAPES the walk") {
    val s = spark
    import s.implicits._
    val store = "cusum-test"
    InMemoryStore.clear(store)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[CusumStream.Ord]
    // target 200c/day, 20% slack, alarm at 1 target-day
    val q = CusumStream.cusumQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-cusum").toString,
      targetCents = 200L, slackBp = 2000L, hMeanDays = 1L)
    try {
      // batch 1: days 1-3 hot (400c) — alarm should raise by day 2
      mem.addData(ord(1, 4.0, "2024-01-01"), ord(2, 4.0, "2024-01-02"),
        ord(3, 4.0, "2024-01-03"))
      q.processAllAvailable()
      val st = new InMemoryStore(store)
      def got(): Map[String, (Long, Long, Long)] =
        st.scan("cusum_pos_bp").map { case (k, p) =>
          k.head -> ((p, st.get("cusum_neg_bp", k).get,
            st.get("cusum_alarm", k).get))
        }.toMap
      val exp1 = walk(Seq("2024-01-01" -> 400L, "2024-01-02" -> 400L,
        "2024-01-03" -> 400L), 200L, 2000L, 1L)
      assert(got() == exp1, s"got=${got()} want=$exp1")
      assert(got()("2024-01-02")._3 == 1L) // pos alarm by day 2
      // batch 2: a LATE order lands on day 2 AND day 4 arrives —
      // day 2's new total reshapes day 3+'s accumulation
      mem.addData(ord(4, 2.0, "2024-01-02"), ord(5, 0.5, "2024-01-04"))
      q.processAllAvailable()
      val exp2 = walk(Seq("2024-01-01" -> 400L, "2024-01-02" -> 600L,
        "2024-01-03" -> 400L, "2024-01-04" -> 50L), 200L, 2000L, 1L)
      assert(got() == exp2, s"got=${got()} want=$exp2")
    } finally q.stop()
  }

  test("cusumBatch replay is a no-op; quiet series never alarms; negative side fires on collapse") {
    val s = spark
    import s.implicits._
    val store = "cusum-replay"
    InMemoryStore.clear(store)
    val batch = Seq(("2024-01-01", 200L), ("2024-01-02", 210L),
      ("2024-01-03", 190L), ("2024-01-04", 10L), ("2024-01-05", 10L))
      .toDF("day", "cents")
    def run(): Unit = CusumStream.cusumBatch(InMemoryProvider(store),
      200L, 2000L, 1L)(batch, 0L)
    run()
    val st = new InMemoryStore(store)
    val once = CusumStream.Tables.map(t => st.scan(t).toMap)
    run()
    assert(CusumStream.Tables.map(t => st.scan(t).toMap) == once)
    // in-band days never alarm (dev within the ±20% slack)
    assert(st.get("cusum_alarm", Seq("2024-01-03")).get == 0L)
    // two near-zero days accumulate past 1 target-day → neg alarm
    assert(st.get("cusum_alarm", Seq("2024-01-05")).get == 2L)
    assert(st.get("cusum_pos_bp", Seq("2024-01-05")).get == 0L)
  }
}
