package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Profile
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.FdStream

/** Streaming FD monitor: exact g3-report parity with the q319 batch
  * audit across batch splits (incl. the live break of a previously
  * holding FD), and replay idempotence (absolute puts). */
class FdStreamSpec extends SparkSpec {

  private def cellsOf(st: InMemoryStore): Map[(String, String), Long] =
    st.scan(FdStream.Table).map { case (k, v) => (k.head, k(1)) -> v }.toMap

  private def batchReport(rows: Seq[(Long, String)])
      : (Long, Long, Long, Option[Long], Int) = {
    val s = spark
    import s.implicits._
    val r = Profile.fdAudit(rows.toDF("k", "v"), "k", "v", "t")
      .collect().head
    (r.getAs[Long]("n_rows"), r.getAs[Long]("n_groups"),
      r.getAs[Long]("violating_groups"),
      Option(r.getAs[java.lang.Long]("g3_bp")).map(_.longValue),
      r.getAs[Int]("holds"))
  }

  test("streamed FD cells reproduce the q319 report; a live break flips holds") {
    val s = spark
    import s.implicits._
    val name = "fd-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = FdStream.fdQuery(
      mem.toDF().toDF("k", "v"), "k", "v",
      InMemoryProvider(name),
      Files.createTempDirectory("graft-fd").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def feed(ds: (Long, String)*): Unit = {
      fed ++= ds; mem.addData(ds: _*); q.processAllAvailable()
    }
    try {
      // batch 1: the FD holds (every key maps to one value)
      feed((1L, "a"), (1L, "a"), (2L, "b"))
      val st = new InMemoryStore(name)
      val r1 = FdStream.fdReport(cellsOf(st))
      assert(r1 == batchReport(fed.toSeq), "after batch 1")
      assert(r1._5 == 1, "FD must hold after batch 1")
      // batch 2: one conflicting row breaks key 1 within a trigger
      feed((1L, "b"), (3L, "c"))
      val r2 = FdStream.fdReport(cellsOf(st))
      assert(r2 == batchReport(fed.toSeq), "after batch 2")
      assert(r2._5 == 0 && r2._3 == 1L, "the break must be visible live")
      // g3: delete 1 of 5 rows (key 1 keeps its 2 'a's) → 2000bp
      assert(r2._4.contains(2000L))
    } finally q.stop()
  }

  test("replaying a batch's cell writes is a no-op (absolute puts)") {
    val s = spark
    import s.implicits._
    val name = "fd-replay"
    InMemoryStore.clear(name)
    val batch = Seq(("1", "a", 4L), ("2", "b", 2L)).toDF("lhs", "rhs", "c")
    FdStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    FdStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    val st = new InMemoryStore(name)
    assert(cellsOf(st) == Map(("1", "a") -> 4L, ("2", "b") -> 2L))
  }
}
