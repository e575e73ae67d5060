package graft

import org.apache.spark.sql.functions._

import graft.ops.TextClean

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dedupLines keeps the first occurrence of each token window") {
    val out = TextClean.dedupLines(docs(1L -> "a b a b c d c d x"), lineTokens = 2)
      .select("n_lines", "n_kept", "removed_bp", "cleaned")
      .as[(Long, Long, Long, String)].head()
    assert(out == ((5L, 3L, 4000L, "a b c d x")))
  }

  test("dedupLines leaves repetition-free documents untouched") {
    val text = "one two three four five six seven"
    val out = TextClean.dedupLines(docs(1L -> text), lineTokens = 3)
      .select("removed_bp", "cleaned").as[(Long, String)].head()
    assert(out == ((0L, text)))
  }

  test("dedupLines: a trailing partial window is its own line") {
    // "x" tail chunk differs from "x y" even though both start with x
    val out = TextClean.dedupLines(docs(1L -> "x y x"), lineTokens = 2)
      .select("n_lines", "n_kept", "cleaned").as[(Long, Long, String)].head()
    assert(out == ((2L, 2L, "x y x")))
  }

  test("dedupLines passes null text through with null stats") {
    val out = TextClean.dedupLines(docs(1L -> null), lineTokens = 2)
      .select("n_lines", "n_kept", "removed_bp", "cleaned")
      .as[(Option[Long], Option[Long], Option[Long], Option[String])].head()
    assert(out == ((None, None, None, None)))
  }

  test("piiScrub redacts emails, digit runs, and deny-list words only") {
    val out = TextClean.piiScrub(
      docs(1L -> "customer x customers accountant 12345678 a@b.com short 123"))
      .select("pii_hits", "scrubbed").as[(Long, String)].head()
    // word boundaries: 'customers'/'accountant' survive; 123 is short
    assert(out == ((3L, "<PII> x customers accountant <PII> <PII> short 123")))
  }

  test("piiScrub on clean text is the identity with zero hits") {
    val out = TextClean.piiScrub(docs(1L -> "just plain words"))
      .select("pii_hits", "scrubbed").as[(Long, String)].head()
    assert(out == ((0L, "just plain words")))
  }
}
