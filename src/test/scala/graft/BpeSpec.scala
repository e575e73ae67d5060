package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE merge learning vs an independent in-memory reference
  * implementation (same greedy semantics, written against the
  * algorithm, not the operator). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", s"src${id % 4}", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- reference implementation ----

  private def refMerge(syms: List[String], l: String, r: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r)
        acc.init :+ (l + r)
      else acc :+ x
    }

  private def refLearn(corpus: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[List[String], Long] = corpus.flatMap(_.split(' '))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    (1 to rounds).flatMap { r =>
      val counts = vocab.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.drop(1)).map(p => p -> f)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (counts.isEmpty) None
      else {
        val ((l, rr), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        vocab = vocab.groupBy { case (syms, _) => refMerge(syms, l, rr) }
          .map { case (m, xs) => m -> xs.values.sum }
        Some((r.toLong, l, rr, c))
      }
    }
  }

  test("learn matches the reference on a corpus with run/tie trickery") {
    val corpus = Seq(
      "aaa aab abab banana",   // "aa" runs exercise greedy parity
      "aaa abab cable table",
      "banana bandana aa a")
    val got = Bpe.learn(docs(corpus.zipWithIndex.map {
      case (t, i) => (i.toLong + 1) -> t
    }: _*), rounds = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == refLearn(corpus, 4))
  }

  test("greedy run semantics: rule (a,a) on aaaa merges disjoint pairs") {
    // freq-dominant "aa" pair; after round 1 "aaaa" must be [aa][aa],
    // so round 2's top pair over that word is (aa, aa)
    val d = docs(1L -> "aaaa aaaa aaaa", 2L -> "xy")
    val got = Bpe.learn(d, rounds = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "a", "a", 9L)))  // 3 pairs per aaaa × 3 words... greedy COUNT is positional: 3 per word
    assert(got(1) == ((2L, "aa", "aa", 3L)))
  }

  test("learn stops contributing rows when no pairs remain") {
    val d = docs(1L -> "a b c a b")
    val got = Bpe.learn(d, rounds = 3)
      .as[(Long, String, String, Long)].collect()
    assert(got.isEmpty) // all words single-char: never any pair
  }

  test("segment applies learned merges in order") {
    val d = docs(1L -> "banana bandana banana")
    val merges = Bpe.learn(d, rounds = 3)
      .orderBy("round").as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val seg = Bpe.segment(Bpe.vocab(d), merges)
      .select(col("word"), col("syms")).as[(String, Seq[String])]
      .collect().toMap
    // whatever was learned, re-deriving the reference fold must agree
    val expected = Map(
      "banana" -> merges.foldLeft("banana".map(_.toString).toList) {
        case (s, (l, r)) => refMerge(s, l, r) },
      "bandana" -> merges.foldLeft("bandana".map(_.toString).toList) {
        case (s, (l, r)) => refMerge(s, l, r) })
    assert(seg == expected)
  }
}
