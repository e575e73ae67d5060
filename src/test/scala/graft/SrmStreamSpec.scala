package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.SrmStream

/** Streaming SRM monitor: exact parity with the q147 batch check on a
  * split event log, and replay idempotence of the publish path. */
class SrmStreamSpec extends SparkSpec {

  // 2026-01-01 00:00:00 UTC
  private val T0 = 1767225600000L
  private val W0 = "2026-01-01 00:00:00"

  private def ev(id: Long, user: Long, offsetMin: Int) =
    SrmStream.Event(id, new Timestamp(T0 + offsetMin * 60000L), user)

  /** 13 users in the first hour window, several with repeat events
    * (the distinct-users contract under test); odd user count so the
    * two arms can never split exactly 5000/5000 bp. */
  private def windowEvents: Seq[SrmStream.Event] = {
    var id = 0L
    (1L to 13L).flatMap { u =>
      (0 until (1 + (u % 3).toInt)).map { k =>
        id += 1; ev(id, u, (u % 50).toInt + k)
      }
    }
  }

  test("streamed SRM equals the q147 batch check on the same events, across batches") {
    val s = spark
    import s.implicits._
    val store = "srm-parity"
    InMemoryStore.clear(store)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SrmStream.Event]
    val q = SrmStream.srmQuery(mem.toDF(), InMemoryProvider(store),
      Files.createTempDirectory("graft-srm").toString,
      windowDur = "1 hour", slack = "10 minutes",
      splitPct = 50, toleranceBp = 300L)
    try {
      val evs = windowEvents
      val (b1, b2) = evs.splitAt(evs.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // the window is only finalized (append mode) once the watermark
      // passes its end: a later-window sentinel advances it
      mem.addData(ev(9999L, 9999L, 200)); q.processAllAvailable()

      val st = new InMemoryStore(store)
      def table(t: String) = st.scanPrefix(t, Seq(W0))
        .map { case (k, v) => k(1) -> v }.toMap
      val batch = graft.ops.Experiment
        .srmCheck(evs.map(e => e.user_id).toDF("user_id"),
          splitPct = 50, toleranceBp = 300L)
        .collect()
        .map(r => r.getAs[String]("arm") -> ((r.getAs[Long]("n_users"),
          r.getAs[Long]("dev_bp"), r.getAs[Int]("srm_flag").toLong)))
        .toMap
      assert(batch.keySet == Set("A", "B")) // fixture hits both arms
      assert(table("srm_users") == batch.map { case (a, v) => a -> v._1 })
      assert(table("srm_dev") == batch.map { case (a, v) => a -> v._2 })
      assert(table("srm_flag") == batch.map { case (a, v) => a -> v._3 })
      // the sentinel's own window is not finalized — no counts for it
      assert(st.scanPrefix("srm_users", Seq("2026-01-01 03:00:00")).isEmpty)
    } finally q.stop()
  }

  test("re-delivered batch is a no-op: absolute puts + pure-function alert") {
    val s = spark
    import s.implicits._
    val store = "srm-replay"
    InMemoryStore.clear(store)
    val finalized = Seq((W0, "A", 7L), (W0, "B", 6L))
      .toDF("window_start", "arm", "n_users")
    val body = SrmStream.srmBatch(InMemoryProvider(store), 50, 300L) _
    body(finalized, 0L)
    val st = new InMemoryStore(store)
    val snap = SrmStream.Tables.map(t => t -> st.scan(t).toMap).toMap
    body(finalized, 1L) // crash-replay of the same finalized rows
    assert(SrmStream.Tables.map(t => t -> st.scan(t).toMap).toMap == snap)
    // sanity: 7/13 = 5384 bp → dev 384 > 300 → flag
    assert(st.get("srm_dev", Seq(W0, "A")) == Some(384L))
    assert(st.get("srm_flag", Seq(W0, "A")) == Some(1L))
    assert(st.get("srm_flag", Seq(W0, "B")) == Some(1L))
  }
}
