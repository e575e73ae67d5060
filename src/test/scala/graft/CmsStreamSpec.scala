package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.CountMin
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.CmsStream

/** Streaming CMS: exact cell parity with the q296 batch sketch across
  * batch splits, replay idempotence (absolute puts), and point
  * estimates matching the batch min-read. */
class CmsStreamSpec extends SparkSpec {

  private def doc(id: Long, text: String) = (id, text)

  private def cellsOf(st: InMemoryStore): Map[(Int, Long), Long] =
    st.scan(CmsStream.Table).map { case (k, v) =>
      (k.head.toInt, k(1).toLong) -> v
    }.toMap

  private def batchCells(texts: Seq[(Long, String)]): Map[(Int, Long), Long] = {
    val s = spark
    import s.implicits._
    val docs = texts.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CountMin.sketch(docs).collect()
      .map(r => (r.getAs[Int]("row_id"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
  }

  test("streamed CMS cells equal the batch sketch across batch splits; estimates match") {
    val s = spark
    import s.implicits._
    val name = "cms-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CmsStream.cmsQuery(
      mem.toDF().toDF("doc_id", "text"),
      InMemoryProvider(name),
      Files.createTempDirectory("graft-cms").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def feed(ds: (Long, String)*): Unit = {
      fed ++= ds; mem.addData(ds: _*); q.processAllAvailable()
    }
    try {
      feed(doc(1, "alpha beta alpha"), doc(2, "beta gamma"))
      val st = new InMemoryStore(name)
      assert(cellsOf(st) == batchCells(fed.toSeq), "after batch 1")
      // batch 2 folds INTO the same cells (cumulative absolutes)
      feed(doc(3, "alpha alpha delta"))
      assert(cellsOf(st) == batchCells(fed.toSeq), "after batch 2")
      // point estimates: one-sided and equal to the batch min-read
      val cells = cellsOf(st)
      Seq("alpha", "beta", "gamma", "delta").foreach { t =>
        val exact = fed.flatMap(_._2.split(" ")).count(_ == t).toLong
        assert(CmsStream.estimate(cells, t) >= exact, s"underestimated $t")
      }
      assert(CmsStream.estimate(cells, "alpha") >= 4L)
    } finally q.stop()
  }

  test("replaying a batch's cell writes is a no-op (absolute puts)") {
    val s = spark
    import s.implicits._
    val name = "cms-replay"
    InMemoryStore.clear(name)
    val batch = Seq((0, 7L, 42L), (1, 9L, 13L))
      .toDF("row_id", "bucket", "c")
    CmsStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    CmsStream.writeBatch(InMemoryProvider(name))(batch, 0L) // replay
    val st = new InMemoryStore(name)
    assert(cellsOf(st) == Map((0, 7L) -> 42L, (1, 9L) -> 13L))
  }
}
