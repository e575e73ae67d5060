package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{InMemoryProvider, InMemoryStore}
import graft.streaming.{CorpusStream, TokenStream}

/** Streaming heavy-hitters monitor: exact in the uncompressed regime,
  * bounded (and head-preserving) under compression, replay-idempotent
  * merge. */
class TokenStreamSpec extends SparkSpec {

  private def doc(id: Long, text: String) =
    CorpusStream.In(id, text, "en", "web", Timestamp.valueOf("2024-01-01 00:00:00"))

  private def state(store: InMemoryStore): Map[String, Long] =
    store.scan("hh_state").map { case (k, v) => k.head -> v }.toMap

  private def topk(store: InMemoryStore): Map[String, Long] =
    store.scan("hh_topk").map { case (k, v) => k.head -> v }.toMap

  test("uncompressed regime: streamed counts across batches are EXACT; dec stays 0") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val name = "hh-exact"
    InMemoryStore.clear(name)
    val mem = MemoryStream[CorpusStream.In]
    val q = TokenStream.hhQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-hh").toString, m = 64, k = 3)
    try {
      mem.addData(doc(1, "apple apple pear"), doc(2, "apple fig"))
      q.processAllAvailable()
      mem.addData(doc(3, "pear apple kiwi"))
      q.processAllAvailable()
      val st = new InMemoryStore(name)
      assert(state(st) == Map("apple" -> 4L, "pear" -> 2L,
        "fig" -> 1L, "kiwi" -> 1L))
      assert(st.get("hh_meta", Seq("n")).contains(8L))
      assert(st.get("hh_meta", Seq("dec")).contains(0L))
      // k=3 cut: fig wins the tie against kiwi alphabetically
      assert(topk(st) == Map("apple" -> 4L, "pear" -> 2L, "fig" -> 1L))
    } finally q.stop()
  }

  test("compressed regime: state stays ≤ m, the head survives, bounds hold") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val name = "hh-small"
    InMemoryStore.clear(name)
    val mem = MemoryStream[CorpusStream.In]
    // m=2: the merge must compress; "hot" dominates every batch
    val q = TokenStream.hhQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-hh").toString, m = 2, k = 2)
    val exact = scala.collection.mutable.HashMap.empty[String, Long]
    def feed(texts: String*): Unit = {
      texts.zipWithIndex.foreach { case (t, i) =>
        t.split(' ').foreach(w => exact.update(w, exact.getOrElse(w, 0L) + 1L))
        mem.addData(doc(i.toLong, t))
      }
      q.processAllAvailable()
    }
    try {
      feed("hot hot hot cold", "hot hot warm mild", "hot hot cool damp")
      val st = new InMemoryStore(name)
      val got = state(st)
      val dec = st.get("hh_meta", Seq("dec")).get
      assert(got.size <= 2)
      assert(got.contains("hot"), s"head token lost: $got")
      // Misra-Gries invariant per surviving counter
      got.foreach { case (t, c) =>
        val e = exact(t)
        assert(c <= e && e <= c + dec, s"$t: counter=$c exact=$e dec=$dec")
      }
      assert(st.get("hh_meta", Seq("n")).contains(exact.values.sum))
    } finally q.stop()
  }

  test("replaying an applied batch is a no-op (ledger inside the merge tx)") {
    val s = spark
    import s.implicits._
    val name = "hh-replay"
    InMemoryStore.clear(name)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[CorpusStream.In]
    val q = TokenStream.hhQuery(mem.toDF(), InMemoryProvider(name),
      Files.createTempDirectory("graft-hh").toString, m = 8, k = 2)
    try {
      mem.addData(doc(1, "red red blue"))
      q.processAllAvailable()
    } finally q.stop()
    val st = new InMemoryStore(name)
    val before = (state(st), st.get("hh_meta", Seq("n")),
      st.get("hh_meta", Seq("dec")), topk(st))
    // re-deliver batch 0 by hand — the merge must skip on the ledger
    val replay = Seq((1L, "red red blue", "en", "web",
      Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "lang", "source", "ts")
    TokenStream.hhBatch(InMemoryProvider(name), 8, 2)(replay, 0L)
    val after = (state(st), st.get("hh_meta", Seq("n")),
      st.get("hh_meta", Seq("dec")), topk(st))
    assert(after == before)
    assert(state(st) == Map("red" -> 2L, "blue" -> 1L))
  }
}
