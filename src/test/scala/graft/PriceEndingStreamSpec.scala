package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Integrity
import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.{PriceEndingStream, TrailingStream}

/** Streaming price-ending census: parity with the q346 batch walk
  * across batch splits, replay idempotence, census unit. */
class PriceEndingStreamSpec extends SparkSpec {

  private def order(id: Long, day: String, price: Double) =
    TrailingStream.Order(id, Timestamp.valueOf(s"$day 12:00:00"), price)

  private def batchCensus(events: Seq[TrailingStream.Order], k: Int)
      : Map[(String, String), Long] = {
    val s = spark
    import s.implicits._
    val li = events.map(e => Tuple1(e.total_price))
      .toDF("l_extendedprice")
    Integrity.priceEndings(li, k).collect().flatMap { r =>
      val l = r.getAs[String]("ending")
      Seq((l, "n") -> r.getAs[Long]("n_prices"),
        (l, "share_bp") -> r.getAs[Long]("share_bp"),
        (l, "expected_bp") -> r.getAs[Long]("expected_bp"),
        (l, "excess_bp") -> r.getAs[Long]("excess_bp"))
    }.toMap
  }

  private def storeCensus(st: InMemoryStore): Map[(String, String), Long] =
    st.scan(PriceEndingStream.CensusTable)
      .map { case (k, v) => (k(0), k(1)) -> v }.toMap

  test("streamed census equals batch q346 across splits; rest rollup forms at k") {
    val s = spark
    import s.implicits._
    val name = "priceending-test"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[TrailingStream.Order]
    val q = PriceEndingStream.endingQuery(mem.toDF(),
      InMemoryProvider(name),
      Files.createTempDirectory("graft-pe").toString, k = 2)
    val fed = scala.collection.mutable.ArrayBuffer.empty[TrailingStream.Order]
    def feed(es: TrailingStream.Order*): Unit = {
      fed ++= es; mem.addData(es: _*); q.processAllAvailable()
    }
    try {
      val st = new InMemoryStore(name)
      feed(order(1, "2024-01-01", 1.99), order(2, "2024-01-01", 2.99),
        order(3, "2024-01-01", 3.00))
      assert(storeCensus(st) == batchCensus(fed.toSeq, 2), "after batch 1")
      // a third ending pushes one cell into the rest rollup at k=2
      feed(order(4, "2024-01-01", 4.50), order(5, "2024-01-01", 5.99))
      assert(storeCensus(st) == batchCensus(fed.toSeq, 2), "after batch 2")
      assert(storeCensus(st).contains(("rest", "n")))
    } finally q.stop()
  }

  test("census walk unit: head order, rest mass, closed shares") {
    val got = PriceEndingStream.census(
      Map(99L -> 3L, 0L -> 2L, 50L -> 1L), k = 2)
    assert(got == Seq(
      ("99", 3L, 5000L, 100L, 4900L),
      ("00", 2L, 3333L, 100L, 3233L),
      ("rest", 1L, 1666L, 100L, 1566L)))
    assert(PriceEndingStream.census(Map.empty).isEmpty)
  }

  test("replaying a cell put is a no-op (absolute ledger)") {
    val s = spark
    import s.implicits._
    val name = "priceending-replay"
    InMemoryStore.clear(name)
    val batch = Seq((99L, 5L), (0L, 2L)).toDF("e", "n")
    PriceEndingStream.endingBatch(InMemoryProvider(name))(batch, 0L)
    PriceEndingStream.endingBatch(InMemoryProvider(name))(batch, 0L)
    val st = new InMemoryStore(name)
    assert(st.scan(PriceEndingStream.CellTable).toMap ==
      Map(Seq("99") -> 5L, Seq("0") -> 2L))
  }
}
