package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Percentiles
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.QuantileBandStream

/** Streaming log-band quantile sketch: exact cell parity with the
  * q303 batch band table across batch splits, interval reads matching
  * the batch walk, and replay idempotence (absolute puts). */
class QuantileBandStreamSpec extends SparkSpec {

  private val Ranks = Seq(5000L, 9000L)

  private def cellsOf(st: InMemoryStore): Map[(String, Int), Long] =
    st.scan(QuantileBandStream.Table).map { case (k, v) =>
      (k.head, k(1).toInt) -> v
    }.toMap

  /** Batch twin: (group, rank) → (band, lo, hi) straight from q303's
    * columns on the same fed rows. */
  private def batchBands(rows: Seq[(String, Double)])
      : Map[(String, Long), (Int, Long, Long)] = {
    val s = spark
    import s.implicits._
    Percentiles.sketchQuantileTable(
      rows.toDF("l_returnflag", "l_extendedprice"),
      "l_returnflag", "l_extendedprice", Ranks)
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[Long]("rank_bp")) ->
        ((r.getAs[Int]("sk_band"), r.getAs[Long]("sk_lo_cents"),
          r.getAs[Long]("sk_hi_cents"))))
      .toMap
  }

  test("streamed band cells reproduce the q303 interval read across batch splits") {
    val s = spark
    import s.implicits._
    val name = "qband-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = QuantileBandStream.bandQuery(
      mem.toDF().toDF("l_returnflag", "l_extendedprice"),
      "l_returnflag", "l_extendedprice",
      InMemoryProvider(name),
      Files.createTempDirectory("graft-qband").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def feed(ds: (String, Double)*): Unit = {
      fed ++= ds; mem.addData(ds: _*); q.processAllAvailable()
    }
    try {
      feed(("A", 1.0), ("A", 3.0), ("A", 10.0), ("B", 0.5), ("B", 7.0))
      val st = new InMemoryStore(name)
      assert(QuantileBandStream.quantileBands(cellsOf(st), Ranks) ==
        batchBands(fed.toSeq), "after batch 1")
      // batch 2 folds INTO the same cells; a new group appears live
      feed(("A", 2.0), ("C", 100.0), ("C", 0.25))
      assert(QuantileBandStream.quantileBands(cellsOf(st), Ranks) ==
        batchBands(fed.toSeq), "after batch 2")
      // structural guarantee carried from the batch op: the interval
      // is at most 2x wide (hi < 2*lo unless the band is 0)
      QuantileBandStream.quantileBands(cellsOf(st), Ranks).values
        .foreach { case (b, lo, hi) =>
          assert(b == 0 || hi < 2 * lo, s"band $b wider than 2x") }
    } finally q.stop()
  }

  test("hand walk: nearest-rank crossing over ascending bands") {
    // group g: 3 values in band 7 (64..127c), 1 in band 10
    val cells = Map(("g", 7) -> 3L, ("g", 10) -> 1L)
    val got = QuantileBandStream.quantileBands(cells, Seq(5000L, 10000L))
    // p50: rank ceil(4*0.5)=2 → band 7; p100: rank 4 → band 10
    assert(got(("g", 5000L)) == ((7, 64L, 127L)))
    assert(got(("g", 10000L)) == ((10, 512L, 1023L)))
  }

  test("replaying a batch's cell writes is a no-op (absolute puts)") {
    val s = spark
    import s.implicits._
    val name = "qband-replay"
    InMemoryStore.clear(name)
    val batch = Seq(("A", 7, 42L), ("B", 9, 13L)).toDF("grp", "band", "c")
    QuantileBandStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    QuantileBandStream.writeBatch(InMemoryProvider(name))(batch, 0L)
    val st = new InMemoryStore(name)
    assert(cellsOf(st) == Map(("A", 7) -> 42L, ("B", 9) -> 13L))
  }
}
